"""Full-render (leaf size x traversal kernel) co-tune — round 4.

The standalone kernel A/B (bench_wide_ab.py) measures traversal alone;
production leaf size is chosen by FULL-render throughput where shading,
NEE, sort and accumulation dilute traversal wins.  This renders the
scene end-to-end (depth 4, spp 4, FrameStats fetch-synced best-of-3)
for each (leaf, kernel) combo by committing at that leaf with
accel='bvh4' and stripping 'nodes4' from the packet for binary rows.

Usage: python scripts/bench_leaf_kernel_e2e.py [--scene colonnade]
       [--res 1024] [--leaves 32,64] [--kernels binary,bvh4]
"""
import argparse
import dataclasses
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', type=str, default='colonnade')
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--leaves', type=str, default='32,64')
    ap.add_argument('--kernels', type=str, default='binary,bvh4')
    ap.add_argument('--spp', type=int, default=4)
    ap.add_argument('--depth', type=int, default=4)
    args = ap.parse_args()

    import jax
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.devices(), flush=True)
    cam = getattr(builtin_scenes, args.scene + '_camera')(
        args.res, args.res)
    params = pt.PTParams(max_depth=args.depth)
    w = h = args.res

    for leaf in (int(x) for x in args.leaves.split(',')):
        sb = getattr(builtin_scenes, args.scene)()
        sc = sb.commit(leaf_size=leaf, accel='bvh4')
        variants = []
        for k in args.kernels.split(','):
            if k == 'binary':
                pk = {q: v for q, v in sc.packet.items() if q != 'nodes4'}
                variants.append((k, dataclasses.replace(sc, packet=pk)))
            else:
                if 'nodes4' not in sc.packet:
                    print("leaf %d: no nodes4 (SMEM guard) — skip %s"
                          % (leaf, k), flush=True)
                    continue
                variants.append((k, sc))
        for tag, s in variants:
            t0 = time.perf_counter()
            _r.render_frame(s, cam, params, w, h, spp=args.spp, seed=0)
            tc = time.perf_counter() - t0
            best = None
            mrps = None
            for seed in (1, 2, 3):
                _, stats = _r.render_frame(s, cam, params, w, h,
                                           spp=args.spp, seed=seed)
                if best is None or stats.seconds < best:
                    best, mrps = stats.seconds, stats.mrps
            print("%s leaf %-3d %-7s %6.2f s  %5.2f Mrps  (compile %.0fs)"
                  % (args.scene, leaf, tag, best, mrps, tc), flush=True)


if __name__ == '__main__':
    main()
