"""Within-one-process A/B of the compacted-path chunk budget (round 5).

The trace_compacted driver dispatches ONE bounce at a time, so the
watchdog constraint is a single bounce, not the whole scan — yet
_pass_budget used to apply the whole-scan 2^24/depth divisor to it.
At depth 10 that is a 1.67M-ray chunk: the production 1536^2 stereo
face (2.36M px) split into two chunks whose 0.68M tail was PADDED 2.4x
with duplicate rays, and the 1024^2 sponza frame ran one chunk per
sample instead of folding samples into one wider (more coherent)
wavefront.  The relaxed single-bounce budget (2^22 rays) removes the
padding and halves the per-bounce sync/dispatch overhead count.

Old side is reproduced exactly via max_rays_per_pass=2^24/depth (and
spp_per_pass_cap=1, which _pass_budget's BVH cap would have set).

Usage: python scripts/bench_chunk_cap_ab.py [--res 1536] [--spp 2]
           [--depth 10] [--frames 2] [--scene colonnade] [--stereo]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=1536)
    ap.add_argument('--spp', type=int, default=2)
    ap.add_argument('--depth', type=int, default=10)
    ap.add_argument('--frames', type=int, default=2)
    ap.add_argument('--scene', type=str, default='colonnade')
    ap.add_argument('--stereo', action='store_true', default=None)
    args = ap.parse_args()

    import jax
    from yulio_raytracer_tpu.utils import compile_cache
    compile_cache.enable("/root/.cache/jax_comp")
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.cameras import cameras as cam

    print("backend:", jax.devices(), flush=True)
    scene = getattr(builtin_scenes, args.scene)().commit(leaf_size=32)
    w = h = args.res
    if args.stereo:
        l2w = cam.look_at((-9.0, 2.2, 0.0), (10.0, 1.6, 0.0),
                          (0.0, 1.0, 0.0))
        camera = cam.make_stereo_rig(l2w, scene_scale=0.05)[1]
        params = pt.PTParams(max_depth=args.depth, t_max_shadow_ray=120.0)
    else:
        camera = getattr(builtin_scenes, args.scene + '_camera')(w, h)
        params = pt.PTParams(max_depth=args.depth)

    old_budget = max(1 << 18, (1 << 24) // args.depth) // 1024 * 1024
    for label, kw in [("old 2^24/depth", dict(max_rays_per_pass=old_budget,
                                              spp_per_pass_cap=1)),
                      ("new 2^22/bounce", {})]:
        t0 = time.perf_counter()            # warmup absorbs compiles
        renderer.render_frame(scene, camera, params, w, h, spp=args.spp,
                              seed=99, compaction='auto', **kw)
        warm_s = time.perf_counter() - t0
        best = None
        for f in range(args.frames):
            _, stats = renderer.render_frame(
                scene, camera, params, w, h, spp=args.spp, seed=f,
                compaction='auto', **kw)
            best = stats if best is None else (
                stats if stats.seconds < best.seconds else best)
            print(f"  {label}: seed={f} {stats.seconds:.2f}s "
                  f"{stats.mrps:.3f} Mrps ({stats.num_rays/1e6:.1f} Mray)",
                  flush=True)
        print(f"{label}: best {best.seconds:.2f}s {best.mrps:.3f} Mrps "
              f"(warmup+compile {warm_s:.1f}s)", flush=True)


if __name__ == '__main__':
    main()
