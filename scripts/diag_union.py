"""How does packet-union traversal cost scale with packet size?

The packet kernel shares one stack per BLOCK=1024 rays: a node is
visited if ANY ray in the packet wants it, so incoherent packets pay the
union of their rays' node sets.  This prints, for hit-point-sorted
bounce-1 rays on the colonnade scene:

* the kernel's own debug counters (pops / culled / leaf visits /
  tri rows) at BLOCK=1024 — ground truth on TPU;
* a CPU union-traversal simulation across group sizes 32..1024 —
  the scaling curve that says what smaller shared stacks would buy.
  (No best-t pop culling in the sim, so absolute numbers are an upper
  bound; the ratio between sizes is the signal.)

Usage: python scripts/diag_union.py [--res 512] [--groups 12]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def union_cost(nodes, o, d, tn, tf):
    """Union-stack traversal cost of one ray group over packed nodes
    ((N, 8): lo, hi, right/start, tag; left child = i+1)."""
    import numpy as np
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
        if tag < 0:                       # interior
            stack.append(int(nodes[i, 6]))
            stack.append(i + 1)
        else:                             # leaf
            leaf_visits += 1
            tri_rows += (int(tag) + 7) // 8
    return pops, leaf_visits, tri_rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--groups', type=int, default=12)
    ap.add_argument('--leaf', type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend(), flush=True)
    scene = builtin_scenes.colonnade().commit(leaf_size=args.leaf)
    pk = scene.packet
    nodes, tris = pk['nodes'], pk['tris']
    nodes_np = np.asarray(nodes).reshape(-1, 8)
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
              use_cull=scene.any_cull)

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
    hit, counts_cam = ppt.intersect_packet(nodes, tris, org, dirn, tn, tf,
                                           debug_counts=True, **kw)
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
    o1 = p0 + d1 * 1e-3
    tf1 = jnp.where(valid, jnp.inf, -1.0)

    # kernel ground truth on the sorted wavefront
    perm = ppt.hitpoint_sort_perm(o1, scene.bbox_lo, scene.bbox_hi,
                                  live=tf1 > 0)
    o1s = o1[perm]
    d1s = d1[perm]
    tns = tn[perm]
    tfs = tf1[perm]
    _, counts_b1 = ppt.intersect_packet(nodes, tris, o1s, d1s, tns, tfs,
                                        debug_counts=True, **kw)
    for label, c in (("camera", counts_cam), ("bounce1-sorted",
                                              counts_b1)):
        c = np.asarray(c)
        print("%16s BLOCK=1024 per-packet mean: pops %7.0f  culled %7.0f"
              "  leaves %7.0f  trirows %7.0f   (tests/ray: box %.0f"
              " tri %.0f)" % (
                  label, c[:, 0].mean(), c[:, 1].mean(), c[:, 2].mean(),
                  c[:, 3].mean(),
                  c[:, 0].mean() * 2 / ppt.BLOCK,
                  c[:, 3].mean() * 8 / ppt.BLOCK), flush=True)

    # CPU union scaling curve on the same sorted population
    o1h = np.asarray(o1s, np.float64)
    d1h = np.asarray(d1s, np.float64)
    tnh = np.asarray(tns, np.float64)
    tfh = np.asarray(tfs, np.float64)
    rs = np.random.RandomState(0)
    for g in (32, 64, 128, 256, 512, 1024):
        tot = np.zeros(3)
        ngroups = args.groups
        for _ in range(ngroups):
            s = rs.randint(0, n // g) * g
            sel = slice(s, s + g)
            live = tfh[sel] > 0
            if not live.any():
                continue
            p, lv, tr = union_cost(nodes_np, o1h[sel][live],
                                   d1h[sel][live], tnh[sel][live],
                                   tfh[sel][live])
            tot += (p, lv, tr)
        tot /= ngroups
        print("group %5d: pops/ray %7.1f  leaves/ray %6.2f  "
              "trirows/ray %6.2f  (boxtests/ray %.0f, tritests/ray %.0f)"
              % (g, tot[0] / g, tot[1] / g, tot[2] / g,
                 2 * tot[0] / g, 8 * tot[2] / g), flush=True)


if __name__ == '__main__':
    main()
