"""Full-render A/B: commit(accel='bvh2') vs commit(accel='bvh4') on the
production regimes, on the live device (round 5).

Round 4 measured the wide kernels winning standalone but losing
end-to-end, and kept them opt-in.  Round 5 changed both sides of that
trade: the row-aligned default tree halved tri-rows/packet (the kernel
is no longer pair-test-bound — bench.py utilization metric), and the
compacted driver routes every default-path traversal through the wide
kernels when the scene commits nodes4.  Re-measure before trusting the
round-4 conclusion.

Usage: python scripts/bench_accel_ab.py [--scene colonnade] [--res 1024]
       [--spp 2] [--depth 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', type=str, default='colonnade')
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--spp', type=int, default=2)
    ap.add_argument('--depth', type=int, default=4)
    ap.add_argument('--accels', nargs='*', default=['bvh2', 'bvh4'])
    args = ap.parse_args()

    import numpy as np
    import jax
    from yulio_raytracer_tpu.utils import compile_cache
    compile_cache.enable("/root/.cache/jax_comp")
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.film import accum

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    w = h = args.res
    camera = getattr(builtin_scenes, args.scene + '_camera')(w, h)
    params = pt.PTParams(max_depth=args.depth)
    imgs, rates = {}, {}
    for accel in args.accels:
        scene = getattr(builtin_scenes, args.scene)().commit(
            leaf_size=32, accel=accel)
        print("%s: committed accel=%s (nodes4 %s)" % (
            accel, scene.accel, 'nodes4' in (scene.packet or {})),
            flush=True)
        t0 = time.time()
        renderer.render_frame(scene, camera, params, w, h, spp=args.spp,
                              seed=0)
        print("  compile+first: %.1f s" % (time.time() - t0), flush=True)
        best = None
        for s in (1, 2):
            film, stats = renderer.render_frame(scene, camera, params,
                                                w, h, spp=args.spp,
                                                seed=s)
            if best is None or stats.mrps > best.mrps:
                best = stats
            if s == 1:
                imgs[accel] = np.asarray(accum.resolve(film))
        rates[accel] = best
        print("  %-5s %dx%d spp=%d depth=%d:  %6.2f Mrps  (%.2f s)"
              % (accel, w, h, args.spp, args.depth, best.mrps,
                 best.seconds), flush=True)
    if len(imgs) == 2:
        a, b = [imgs[m] for m in args.accels[:2]]
        print("identical imgs:", bool((a == b).all()),
              " max|d|:", float(np.abs(a - b).max()), flush=True)
        r = [rates[m].mrps for m in args.accels[:2]]
        print("%s vs %s: %.3fx" % (args.accels[1], args.accels[0],
                                   r[1] / max(r[0], 1e-9)), flush=True)


if __name__ == '__main__':
    main()
