"""Outer-product pairs kernel vs row-packed dense kernel on TPU.

STALE TIMING -- pre-correction diagnostic: syncs with
`jax.block_until_ready`, a NO-OP on the tunneled axon backend
(README "Measurement correction"), so ms/Mrps columns report
dispatch, not execution.  Kept for the ray-population/kernel
construction; for trustworthy numbers use
scripts/bench_incoherent.py (fetch-synced, input-varied).

Usage: python scripts/bench_pairs.py
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
    from yulio_raytracer_tpu.geometry import mesh as gmesh
    from yulio_raytracer_tpu.ops import pallas_dense as ppd
    from yulio_raytracer_tpu.ops import pallas_pairs as ppp

    print("backend:", jax.default_backend())
    sb = builtin_scenes.colonnade()
    scene = sb.commit(leaf_size=32)
    tris_all = scene.packet['tris']
    host = {k: np.asarray(v) for k, v in scene.geom.items()
            if k in ('ng', 'cull')}
    planes_np, rows_np = ppp.pack_planes(
        np.asarray(scene.geom['woop']), host)
    planes = jnp.asarray(planes_np)
    rows = jnp.asarray(rows_np)
    gt_all = planes.shape[0]
    print("tris %d tiles %d" % (scene.num_triangles, gt_all))

    rs = np.random.RandomState(7)
    lo = np.asarray(scene.bbox_lo)
    hi = np.asarray(scene.bbox_hi)

    def rays(n):
        org = jnp.asarray(
            (rs.rand(n, 3) * (hi - lo) + lo).astype(np.float32))
        d = rs.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return org, jnp.asarray(d)

    def timeit(label, fn, pairs, iters=3):
        r = fn()
        jax.block_until_ready(r if not hasattr(r, 't') else r.t)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r if not hasattr(r, 't') else r.t)
        dt = (time.perf_counter() - t0) / iters
        print("%-44s %8.2f ms %8.1f Gpairs/s" % (label, dt * 1e3,
                                                 pairs / dt / 1e9))

    for n, tiles in [(65536, 16), (65536, 64), (262144, 16),
                     (262144, 64), (262144, gt_all)]:
        org, d = rays(n)
        tn = jnp.full((n,), 1e-3)
        tf = jnp.full((n,), np.inf)
        sub = planes[:tiles]
        subrows = rows[:tiles * 128]
        for rt in ([2, 4, 8] if tiles == 64 and n == 262144 else [4]):
            timeit("pairs closest R=%d T=%d rt=%d" % (n, tiles * 128, rt),
                   lambda rt=rt: ppp.intersect_pairs(
                       sub, subrows, org, d, tn, tf, rt=rt),
                   n * tiles * 128)
        timeit("dense closest R=%d T=%d" % (n, tiles * 128),
               lambda: ppd.intersect_dense(
                   tris_all[:tiles * 16], org, d, tn, tf),
               n * tiles * 128)
        tfo = jnp.full((n,), 1.0)
        timeit("pairs any-hit R=%d T=%d" % (n, tiles * 128),
               lambda: ppp.occluded_pairs(sub, org, d, tn, tfo),
               n * tiles * 128)


if __name__ == '__main__':
    main()
