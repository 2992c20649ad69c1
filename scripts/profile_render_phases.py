"""Honest phase attribution for the production render (round 4).

Unlike profile_phases.py (round-2, STALE no-op syncs), this uses the
production `render_frame` end-to-end — FrameStats seconds are
fetch-synced (README "Measurement correction") — and attributes the
frame budget by DELTAS between full-graph ablations:

  depth sweep      d=1..4           -> incremental cost of each bounce
                                       (closest traversal + shading)
  lights stripped  d=4, no lights   -> NEE shadow traversal + light
                                       shading cost (the removed graph)
  binning off      d=4, 'none'      -> net value of the Morton sort
                                       (sort cost vs traversal win)

Each config is rendered twice (warm timing; spp is static, same spp for
warmup and timed call) with different seeds so execution dedup cannot
replay.  Every config is its own compile — budget ~2 min each cold.

Usage: python scripts/profile_render_phases.py [--scene sponza_like]
       [--res 1024] [--spp 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', type=str, default='sponza_like')
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--spp', type=int, default=4)
    args = ap.parse_args()

    import jax
    from yulio_raytracer_tpu.utils import compile_cache
    # via jax.config.update — an env var set here is too late, the axon
    # sitecustomize already imported jax (cache silently disabled)
    compile_cache.enable("/root/.cache/jax_comp")
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    sb = getattr(builtin_scenes, args.scene)()
    camera = getattr(builtin_scenes, args.scene + '_camera')(
        args.res, args.res)
    scene = sb.commit()
    print("scene: %d tris, %d nodes, hbm=%s" % (
        scene.num_triangles, scene.packet['nodes'].shape[0],
        scene.packet_hbm), flush=True)
    sb_dark = getattr(builtin_scenes, args.scene)()
    sb_dark.lights = []
    # drop the lights' emissive meshes too (their light ids would dangle)
    sb_dark.meshes = [m for m in sb_dark.meshes
                      if getattr(m, 'light', -1) < 0]
    dark = sb_dark.commit()

    w = h = args.res

    def run(label, sc, **pt_kw):
        params = pt.PTParams(**pt_kw)
        t0 = time.perf_counter()
        _r.render_frame(sc, camera, params, w, h, spp=args.spp, seed=0)
        tc = time.perf_counter() - t0
        best = None
        for s in (1, 2):
            _, stats = _r.render_frame(sc, camera, params, w, h,
                                       spp=args.spp, seed=s)
            best = stats.seconds if best is None else min(best,
                                                          stats.seconds)
        print("%-28s %8.2f s   %6.2f Mrps   (first call %.1fs)"
              % (label, best, stats.mrps * stats.seconds / best, tc),
              flush=True)
        return best

    # texture ablation: same geometry/lights, every textured material
    # replaced by plain matte — isolates the per-hit atlas gather +
    # st-mapping cost from the rest of shading
    from yulio_raytracer_tpu.shading import materials as gmat
    sb_flat = getattr(builtin_scenes, args.scene)()
    sb_flat.materials = [
        gmat.make_material('matte', {'reflectance': (0.6, 0.6, 0.6)})
        if any(l.tex >= 0 for l in m.lobes) else m
        for m in sb_flat.materials]
    flat = sb_flat.commit()

    t_d = {}
    for d in (1, 2, 3, 4):
        t_d[d] = run("depth %d" % d, scene, max_depth=d)
    t_dark = run("depth 4, lights stripped", dark, max_depth=4)
    t_flat = run("depth 4, textures stripped", flat, max_depth=4)
    t_nobin = run("depth 4, binning off", scene, max_depth=4,
                  ray_binning='none')

    print("\n--- attribution (deltas of full-graph ablations) ---")
    print("camera bounce (d=1 total):      %6.2f s" % t_d[1])
    for d in (2, 3, 4):
        print("bounce %d increment:             %6.2f s"
              % (d - 1, t_d[d] - t_d[d - 1]))
    print("NEE shadow+light shading (d4):  %6.2f s  (full - stripped)"
          % (t_d[4] - t_dark))
    print("texture gathers (d4):           %6.2f s  (full - flat-matte)"
          % (t_d[4] - t_flat))
    print("Morton binning net value (d4):  %6.2f s  (off - on)"
          % (t_nobin - t_d[4]))


if __name__ == '__main__':
    main()
