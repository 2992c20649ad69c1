"""Build-quality ablation for the TPU packet kernel, measured offline on
the thing the kernel actually pays: PACKET-UNION traversal cost (pops /
leaf visits / packed tri-rows per ray at shared-stack group sizes) for
the bounce-1 ray population.

Sweeps the native builder's quality mechanisms independently:
  * spatial splits (SBVH, scene_flat.h:93 RTC_SCENE_HIGH_QUALITY parity)
  * leaf row alignment (leaf starts on the packed 8-tri row grid)
  * row-quantized SAH leaf termination (c_trav, adaptive leaf sizes)

The ray population is generated ONCE and replayed over every tree.  Row
accounting is EXACT: a leaf at start a with n tris touches
(a+n+7)//8 - a//8 packed rows (the kernel's _leaf_groups window).  The
replay has no best-t pop culling, so absolute numbers are upper bounds;
the BETWEEN-TREE ratio is the signal.

Usage: python scripts/diag_sbvh.py [--res 256] [--groups 16]
       [--leaf 32] [--scene colonnade|sponza_like]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def union_cost_exact(nodes, o, d, tn, tf):
    """Union-stack traversal cost of one ray group over packed nodes
    ((N, 8): lo, hi, right/start, tag; left child = i+1) with exact
    packed-row accounting for leaves."""
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
            a = int(nodes[i, 6])
            tri_rows += (a + int(tag) + 7) // 8 - a // 8
    return pops, leaf_visits, tri_rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--groups', type=int, default=16)
    ap.add_argument('--leaf', type=int, default=32)
    ap.add_argument('--scene', type=str, default='colonnade')
    args = ap.parse_args()

    import jax
    # the axon TPU plugin beats the env var; force CPU the way
    # tests/conftest.py does (this diag never needs the chip)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.geometry import bvh as gb
    from yulio_raytracer_tpu.geometry import mesh as gm
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.ops import traverse as xla_trav
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    sb = getattr(builtin_scenes, args.scene)()
    scene = sb.commit(leaf_size=args.leaf, quality='normal')
    packed = gm.pack_meshes(sb.meshes)
    T = len(packed.v0)
    n_dead = int((~packed.valid).sum())

    # bounce-1 population (world-space, tree-independent), sorted by hit
    # point like the production wavefront
    w = h = args.res
    n = w * h
    camera = getattr(builtin_scenes, args.scene + '_camera')(w, h)
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    hit = xla_trav.intersect_bvh(scene.geom, scene.bvh, org, dirn, tn, tf,
                                 leaf_size=scene.leaf_size)
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
    ns = dg['Ns']
    ns = jnp.where((jnp.sum(ns * dirn, -1) > 0)[:, None], -ns, ns)
    u2p = grng.uniform2(jnp.uint32(9), jnp.asarray(order),
                        jnp.zeros((n,), jnp.uint32), jnp.uint32(33))
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
    perm = ppt.hitpoint_sort_perm(o1, scene.bbox_lo, scene.bbox_hi,
                                  live=tf1 > 0)
    o1h = np.asarray(o1[perm], np.float64)
    d1h = np.asarray(d1[perm], np.float64)
    tnh = np.asarray(tn[perm], np.float64)
    tfh = np.asarray(tf1[perm], np.float64)

    def build(name, **kw):
        t0 = time.perf_counter()
        if name == 'obj':
            tree = gb.build_native(packed.v0, packed.e1, packed.e2,
                                   packed.valid, leaf_size=args.leaf)
        else:
            tree = gb.build_native_sbvh(packed.v0, packed.e1, packed.e2,
                                        packed.valid, leaf_size=args.leaf,
                                        **kw)
        return tree, time.perf_counter() - t0

    configs = [
        ('obj(leaf%d)' % args.leaf, 'obj', {}),
        ('spatial', 'sbvh', dict(spatial=True, align_rows=False)),
        ('align', 'sbvh', dict(spatial=False, align_rows=True)),
        ('spatial+align', 'sbvh', dict(spatial=True, align_rows=True)),
        ('sp+al+ct0.25', 'sbvh',
         dict(spatial=True, align_rows=True, c_trav=0.25)),
        ('sp+al+ct0.5', 'sbvh',
         dict(spatial=True, align_rows=True, c_trav=0.5)),
        ('sp+al+ct1.0', 'sbvh',
         dict(spatial=True, align_rows=True, c_trav=1.0)),
        ('al+ct0.5', 'sbvh',
         dict(spatial=False, align_rows=True, c_trav=0.5)),
    ]

    rs = np.random.RandomState(0)
    starts = {g: [int(rs.randint(0, n // g)) * g for _ in range(args.groups)]
              for g in (128, 1024)}
    print("%-16s %7s %8s %6s | %s" % (
        "config", "nodes", "refs", "build",
        "per-ray pops/leaves/trirows at g=128, g=1024"), flush=True)
    for label, kind, kw in configs:
        tree, dt = build(kind, **kw)
        nodes_np = ppt.pack_nodes(tree).astype(np.float64)
        out = []
        for g in (128, 1024):
            tot = np.zeros(3)
            for s in starts[g]:
                sel = slice(s, s + g)
                live = tfh[sel] > 0
                if not live.any():
                    continue
                tot += union_cost_exact(
                    nodes_np, o1h[sel][live], d1h[sel][live],
                    tnh[sel][live], tfh[sel][live])
            tot /= args.groups
            out.append("%.2f/%.2f/%.2f" % (tot[0] / g, tot[1] / g,
                                           tot[2] / g))
        print("%-16s %7d %8d %5.2fs | %s   %s" % (
            label, tree.num_nodes, tree.num_refs - n_dead, dt,
            out[0], out[1]), flush=True)


if __name__ == '__main__':
    main()
