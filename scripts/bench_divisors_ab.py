"""Within-one-process A/B of trace_compacted's bucket divisor set
(round 5).  The coarse set (1,4,16) lands the first post-RR shrink in a
bucket up to 2.2x oversized; the finer set adds /8 and /32 buckets so
the dying tail (bounces 5+ run ~25% -> 0% live) tracks the live count
tighter, at the cost of two more compiled bounce graphs (prewarmed
async: pathtracer._prewarm_shrunk_widths).  Cross-process runs move
+-3-4% on this host (README round-5 dip analysis) — this A/B flips
pathtracer.COMPACT_DIVISORS between configs inside ONE process so the
comparison is clean.

Usage: python scripts/bench_divisors_ab.py [--res 1024] [--spp 2]
           [--depth 10] [--frames 2] [--stereo]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--spp', type=int, default=2)
    ap.add_argument('--depth', type=int, default=10)
    ap.add_argument('--frames', type=int, default=2)
    ap.add_argument('--stereo', action='store_true')
    args = ap.parse_args()

    import jax
    from yulio_raytracer_tpu.utils import compile_cache
    compile_cache.enable("/root/.cache/jax_comp")
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.cameras import cameras as cam

    print("backend:", jax.devices(), flush=True)
    scene = builtin_scenes.sponza_like().commit(leaf_size=32)
    w = h = args.res
    if args.stereo:
        l2w = cam.look_at((-9.0, 2.2, 0.0), (10.0, 1.6, 0.0),
                          (0.0, 1.0, 0.0))
        camera = cam.make_stereo_rig(l2w, scene_scale=0.05)[1]
        params = pt.PTParams(max_depth=args.depth, t_max_shadow_ray=120.0)
    else:
        camera = builtin_scenes.sponza_like_camera(w, h)
        params = pt.PTParams(max_depth=args.depth)

    for divisors in [(1, 4, 16), (1, 4, 8, 16, 32)]:
        pt.COMPACT_DIVISORS = divisors
        t0 = time.perf_counter()            # warmup absorbs compiles
        renderer.render_frame(scene, camera, params, w, h, spp=args.spp,
                              seed=99, compaction='auto')
        warm_s = time.perf_counter() - t0
        best = None
        for f in range(args.frames):
            _, stats = renderer.render_frame(
                scene, camera, params, w, h, spp=args.spp, seed=f,
                compaction='auto')
            best = stats.mrps if best is None else max(best, stats.mrps)
            print(f"  divisors={divisors} seed={f} "
                  f"{stats.seconds:.2f}s {stats.mrps:.3f} Mrps",
                  flush=True)
        print(f"divisors={divisors}: best {best:.3f} Mrps "
              f"(warmup+compile {warm_s:.1f}s)", flush=True)


if __name__ == '__main__':
    main()
