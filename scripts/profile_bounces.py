"""Per-bounce production profile + compaction A/B (round 5).

Measures, on the real device, the two things VERDICT r4 said were never
measured:

1. per-bounce live fractions and per-bounce wall share at depth 10 on
   the production configs (sponza_like 1024^2, stereo_face 1536^2) —
   pathtracer.trace_compacted's bounce_stats stream gives both for free
   (the bounce step is one dispatch; the live-count fetch syncs it);
2. the end-to-end value of live-ray compaction: render_frame
   compaction='off' (the round-4 single-dispatch scan) vs 'auto'
   (host-driven bounce dispatches, live rays gathered to the smallest
   power-of-two bucket between bounces).

Timing rules: fetch-synced FrameStats (README "Measurement correction"),
warmup frame with the SAME static config, min of 2 timed frames with
different seeds (execution-dedup-proof).

Usage: python scripts/profile_bounces.py [--scene sponza_like]
           [--res 1024] [--spp 2] [--depth 10] [--stereo]
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
    ap.add_argument('--spp', type=int, default=2)
    ap.add_argument('--depth', type=int, default=10)
    ap.add_argument('--stereo', action='store_true',
                    help='use the production StereoCube camera + '
                         'tMaxShadowRay 120 (the stereo_face regime)')
    ap.add_argument('--modes', type=str, default='auto,off')
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
    scene = getattr(builtin_scenes, args.scene)().commit(leaf_size=32)
    print("scene: %d tris, %d nodes, hbm=%s" % (
        scene.num_triangles, scene.packet['nodes'].shape[0],
        scene.packet_hbm), flush=True)
    w = h = args.res
    if args.stereo:
        from yulio_raytracer_tpu.cameras import cameras as cam
        l2w = cam.look_at((-9.0, 2.2, 0.0), (10.0, 1.6, 0.0),
                          (0.0, 1.0, 0.0))
        camera = cam.make_stereo_rig(l2w, scene_scale=0.05)[1]
        params = pt.PTParams(max_depth=args.depth, t_max_shadow_ray=120.0)
    else:
        camera = getattr(builtin_scenes, args.scene + '_camera')(w, h)
        params = pt.PTParams(max_depth=args.depth)

    results = {}
    for mode in args.modes.split(','):
        t0 = time.perf_counter()
        _r.render_frame(scene, camera, params, w, h, spp=args.spp,
                        seed=0, compaction=mode)
        tc = time.perf_counter() - t0
        best, best_stats = None, None
        for s in (1, 2):
            stats_list = []
            _, st = _r.render_frame(scene, camera, params, w, h,
                                    spp=args.spp, seed=s,
                                    compaction=mode,
                                    bounce_stats=stats_list)
            if best is None or st.seconds < best.seconds:
                best, best_stats = st, stats_list
        results[mode] = best
        print("\ncompaction=%-5s  %8.2f s   %6.2f Mrps   (compile+warm "
              "%.1fs)" % (mode, best.seconds, best.mrps, tc), flush=True)
        if best_stats:
            # aggregate identical depths across chunks
            agg = {}
            for e in best_stats:
                a = agg.setdefault(e['depth'], dict(width=0, live=0,
                                                    seconds=0.0, n=0))
                a['width'] += e['width']
                a['live'] += e['live']
                a['seconds'] += e['seconds']
                a['n'] += 1
            tot = sum(a['seconds'] for a in agg.values())
            print("  bounce  width(sum)   live(sum)  live%%   wall s  "
                  "share", flush=True)
            for d in sorted(agg):
                a = agg[d]
                print("  %5d  %10d  %10d  %5.1f%%  %7.2f  %5.1f%%" % (
                    d, a['width'], a['live'],
                    100.0 * a['live'] / max(a['width'], 1),
                    a['seconds'], 100.0 * a['seconds'] / max(tot, 1e-9)),
                    flush=True)
    if len(results) == 2:
        ms = list(results)
        a, b = results[ms[0]], results[ms[1]]
        print("\n%s vs %s: %.2fx  (%.2f -> %.2f Mrps)" % (
            ms[0], ms[1], a.mrps / max(b.mrps, 1e-9), b.mrps, a.mrps),
            flush=True)


if __name__ == '__main__':
    main()
