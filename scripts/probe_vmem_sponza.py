"""Round-4 probe: does sponza_like's 15.74 MB packed-triangle table run
VMEM-resident through the BVH4 kernels (closest + any-hit), and what is
the bounce-1 win vs HBM streaming?  Decides TRIS_VMEM_LIMIT_BYTES
(scene.py): the r3 limit of 12.5 MB was conservative; the binary-kernel
probe (_vmem_probe.log) measured +16% with the full table resident.

Usage: python scripts/probe_vmem_sponza.py [--scene sponza_like]
       [--res 1024] [--leaf 32]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', type=str, default='sponza_like')
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--leaf', type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.geometry import bvh as gb, mesh as gm
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import pallas_wide as pw
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    sb = getattr(builtin_scenes, args.scene)()
    camera = getattr(builtin_scenes, args.scene + '_camera')(
        args.res, args.res)
    packed = gm.pack_meshes(sb.meshes)
    tree = gb.build(packed.v0, packed.e1, packed.e2, packed.valid,
                    leaf_size=args.leaf, quality='high')
    host = {k: getattr(packed, k) for k in gb._PER_TRIANGLE_KEYS
            if getattr(packed, k) is not None}
    host = gb.permute_geom(host, tree.order)
    host['woop'] = gm.woop_matrices(host['v0'], host['e1'], host['e2'],
                                    host['valid'])
    nodes4 = jnp.asarray(pw.pack_nodes4(tree))
    tris = jnp.asarray(ppt.pack_tris(host['woop'], host,
                                     pad_rows=ppt._hbm_window(args.leaf)))
    geom = {k: jnp.asarray(v) for k, v in host.items()}
    print("tris %s = %.2f MB, %d bvh4 nodes"
          % (tris.shape, tris.nbytes / 2**20, nodes4.shape[0]),
          flush=True)

    # bounce-1 sorted population (same construction as bench_wide_ab)
    w = h = args.res
    n = w * h
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    hit = pw.intersect_packet4(nodes4, tris, org, dirn, tn, tf,
                               use_cull=True, max_leaf=args.leaf,
                               hbm=True)
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(geom, org, dirn, hit)
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
    perm = ppt.hitpoint_sort_perm(o1, jnp.asarray(tree.lo[0]),
                                  jnp.asarray(tree.hi[0]), live=tf1 > 0)
    o1s, d1s = o1[perm], d1[perm]
    tn1s, tf1s = tn[perm], tf1[perm]

    K = 4

    def amortized(fn, label):
        @jax.jit
        def loop(e0):
            def body(i, acc):
                r = fn(e0 + i.astype(jnp.float32) * 1e-7)
                return acc + jnp.sum(jnp.minimum(r, jnp.float32(1e9)))
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        np.asarray(loop(jnp.float32(0.0)).ravel()[:1])
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.float32((i + 1) * 1e-5)).ravel()[:1])
            times.append(time.perf_counter() - t0)
        dt = min(times) / K
        print("  %-34s %8.1f ms  %8.2f Mrps"
              % (label, dt * 1e3, n / dt / 1e6), flush=True)

    for hbm_mode, label in ((True, "HBM-streamed"), (False, "VMEM")):
        amortized(lambda e, hm=hbm_mode: pw.intersect_packet4(
            nodes4, tris, o1s, d1s, tn1s + e, tf1s, use_cull=True,
            max_leaf=args.leaf, hbm=hm).t,
            "bvh4 bounce-1 closest %s" % label)
        amortized(lambda e, hm=hbm_mode: pw.occluded_packet4(
            nodes4, tris, o1s, d1s, tn1s + e,
            jnp.where(tf1s > 0, jnp.float32(8.0), tf1s),
            use_cull=True, max_leaf=args.leaf,
            hbm=hm).astype(jnp.float32),
            "bvh4 bounce-1 any-hit %s" % label)


if __name__ == '__main__':
    main()
