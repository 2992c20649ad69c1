"""Which wavefront sort key minimizes the 1024-ray packet union?

The packet kernel pays the UNION of its rays' traversal sets; the sort
key decides which rays share a packet.  This CPU simulation replays the
exact bounce-1 population of bench_incoherent.py under candidate keys
and reports union traversal cost per ray at BLOCK=1024 (and 128 for
scale reference):

* oct15   — current production key: octant(3) | morton15(origin)
* oct30   — octant(3) | morton30(origin)  (10 bits/axis)
* mor30   — morton30(origin) only (no octant)
* oct30d  — octant(3) | morton30 with direction bits interleaved at the
            low end (theta/phi 2+2 bits)
* m30oct  — morton30 major, octant minor (cluster by position first)

Usage: python scripts/diag_sortkeys.py [--res 256] [--groups 10]
"""
import argparse
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def union_cost(nodes, o, d, tn, tf):
    inv = 1.0 / np.where(np.abs(d) > 1e-30, d, 1e-30)
    stack = [0]
    pops = leaf_visits = tri_rows = 0
    while stack:
        i = stack.pop()
        pops += 1
        lo, hi = nodes[i, :3], nodes[i, 3:6]
        t0 = (lo[None] - o) * inv
        t1 = (hi[None] - o) * inv
        near = np.maximum(np.minimum(t0, t1).max(1), tn)
        far = np.minimum(np.maximum(t0, t1).min(1), tf)
        if not (near <= far).any():
            continue
        tag = nodes[i, 7]
        if tag < 0:
            stack.append(int(nodes[i, 6]))
            stack.append(i + 1)
        else:
            leaf_visits += 1
            tri_rows += (int(tag) + 7) // 8
    return pops, leaf_visits, tri_rows


def morton(q, bits):
    cell = np.clip((q * ((1 << bits) - 1)).astype(np.uint64),
                   0, (1 << bits) - 1)
    m = np.zeros(q.shape[0], np.uint64)
    for b in range(bits):
        for a in range(3):
            m |= (((cell[:, a] >> b) & 1) << np.uint64(3 * b + a))
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--groups', type=int, default=10)
    ap.add_argument('--leaf', type=int, default=32)
    args = ap.parse_args()

    import jax.numpy as jnp
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.ops import traverse as ops_t
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    scene = builtin_scenes.colonnade().commit(leaf_size=args.leaf,
                                              force_bvh=True)
    nodes_np = np.asarray(scene.packet['nodes']).reshape(-1, 8)

    w = h = args.res
    n = w * h
    camera = builtin_scenes.colonnade_camera(w, h)
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    hit = ops_t.intersect_bvh(scene.geom, scene.bvh, org, dirn, tn, tf,
                              leaf_size=scene.leaf_size)
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
    ns = dg['Ns']
    ns = jnp.where((jnp.sum(ns * dirn, -1) > 0)[:, None], -ns, ns)
    pid = jnp.asarray(order)
    sid = jnp.zeros((n,), jnp.uint32)
    u2p = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(33))
    r_ = jnp.sqrt(u2p[:, 0])
    phi = 2 * np.pi * u2p[:, 1]
    up = jnp.where((jnp.abs(ns[:, 2]) < 0.9)[:, None],
                   jnp.asarray([0., 0., 1.]), jnp.asarray([1., 0., 0.]))
    tx = jnp.cross(up, ns)
    tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
    ty = jnp.cross(ns, tx)
    d1 = ((r_ * jnp.cos(phi))[:, None] * tx
          + (r_ * jnp.sin(phi))[:, None] * ty
          + jnp.sqrt(jnp.maximum(1 - u2p[:, 0], 0.0))[:, None] * ns)
    o1 = np.asarray(p0 + d1 * 1e-3, np.float64)
    d1 = np.asarray(d1, np.float64)
    livem = np.asarray(valid)

    o1 = o1[livem]
    d1 = d1[livem]
    n = o1.shape[0]
    tnh = np.full(n, 1e-3)
    tfh = np.full(n, np.inf)

    lo = np.asarray(scene.bbox_lo, np.float64)
    span = np.maximum(np.asarray(scene.bbox_hi, np.float64) - lo, 1e-6)
    q = np.clip((o1 - lo) / span, 0.0, 1.0)
    oct_ = ((d1[:, 0] < 0).astype(np.uint64)
            | ((d1[:, 1] < 0).astype(np.uint64) << np.uint64(1))
            | ((d1[:, 2] < 0).astype(np.uint64) << np.uint64(2)))
    theta2 = np.clip(((d1[:, 1] * 0.5 + 0.5) * 3.999).astype(np.uint64),
                     0, 3)
    phi2 = np.clip(((np.arctan2(d1[:, 2], d1[:, 0]) / (2 * np.pi) + 0.5)
                    * 3.999).astype(np.uint64), 0, 3)

    m15 = morton(q, 5)
    m30 = morton(q, 10)
    keys = {
        'oct15': (oct_ << np.uint64(15)) | m15,
        'oct30': (oct_ << np.uint64(30)) | m30,
        'mor30': m30,
        'oct30d': (oct_ << np.uint64(34)) | (m30 << np.uint64(4))
                  | (theta2 << np.uint64(2)) | phi2,
        'm30oct': (m30 << np.uint64(3)) | oct_,
    }

    rs = np.random.RandomState(0)
    for name, key in keys.items():
        perm = np.argsort(key, kind='stable')
        for g in (1024, 128):
            tot = np.zeros(3)
            cnt = 0
            for _ in range(args.groups):
                s = rs.randint(0, max(n // g, 1)) * g
                if s + g > n:
                    continue
                sel = perm[s:s + g]
                p, lv, tr = union_cost(nodes_np, o1[sel], d1[sel],
                                       tnh[sel], tfh[sel])
                tot += (p, lv, tr)
                cnt += 1
            tot /= max(cnt, 1)
            print("%-7s g=%4d: pops/ray %7.2f  trirows/ray %6.2f  "
                  "tritests/ray %7.0f" % (name, g, tot[0] / g, tot[2] / g,
                                          8 * tot[2] / g), flush=True)


if __name__ == '__main__':
    main()
