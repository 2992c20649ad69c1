"""Raw pair-test throughput of the dense Pallas intersector on TPU.

STALE TIMING -- pre-correction diagnostic: syncs with
`jax.block_until_ready`, a NO-OP on the tunneled axon backend
(README "Measurement correction"), so ms/Mrps columns report
dispatch, not execution.  Kept for the ray-population/kernel
construction; for trustworthy numbers use
scripts/bench_incoherent.py (fetch-synced, input-varied).

Decides the treelet-binned-dense design: if the VPU dense kernel sustains
~100G+ (ray,tri) pairs/s, then incoherent bounce rays are faster served
by a per-treelet DENSE sweep (zero traversal divergence) than by the
shared-stack packet kernel (~35x leaf-union waste, measured).

Usage: python scripts/bench_dense_pairs.py
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_dense as ppd

    print("backend:", jax.default_backend())
    scene = builtin_scenes.colonnade().commit(leaf_size=32)
    tris_all = scene.packet['tris']
    g_all = tris_all.shape[0]
    print("tris %d rows %d" % (scene.num_triangles, g_all))

    rs = np.random.RandomState(7)
    lo = np.asarray(scene.bbox_lo)
    hi = np.asarray(scene.bbox_hi)

    for n, rows in [(4096, g_all), (65536, 256), (65536, 1024),
                    (262144, 256), (262144, 1024)]:
        tris = tris_all[:rows]
        org = jnp.asarray(
            (rs.rand(n, 3) * (hi - lo) + lo).astype(np.float32))
        d = rs.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        tn = jnp.full((n,), 1e-3)
        tf = jnp.full((n,), np.inf)
        h = ppd.intersect_dense(tris, org, d, tn, tf)
        jax.block_until_ready(h.t)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            h = ppd.intersect_dense(tris, org, d, tn, tf)
        jax.block_until_ready(h.t)
        dt = (time.perf_counter() - t0) / iters
        pairs = n * rows * 8
        print("closest R=%7d T=%6d  %8.2f ms  %8.1f Gpairs/s" % (
            n, rows * 8, dt * 1e3, pairs / dt / 1e9))

        occ = ppd.occluded_dense(tris, org, d, tn,
                                 jnp.full((n,), 1.0))
        jax.block_until_ready(occ)
        t0 = time.perf_counter()
        for _ in range(iters):
            occ = ppd.occluded_dense(tris, org, d, tn,
                                     jnp.full((n,), 1.0))
        jax.block_until_ready(occ)
        dt = (time.perf_counter() - t0) / iters
        print("any-hit R=%7d T=%6d  %8.2f ms  %8.1f Gpairs/s" % (
            n, rows * 8, dt * 1e3, pairs / dt / 1e9))


if __name__ == '__main__':
    main()
