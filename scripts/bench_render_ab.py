"""A/B the full colonnade render across ray-binning modes on the live
device (the north-star regime: 1024^2, depth 4).

Usage: python scripts/bench_render_ab.py [--res 1024] [--spp 2]
       [--modes treelet morton] [--depth 4]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--spp', type=int, default=2)
    ap.add_argument('--depth', type=int, default=4)
    ap.add_argument('--leaf', type=int, default=32)
    ap.add_argument('--modes', nargs='*', default=['treelet', 'morton'])
    args = ap.parse_args()

    import time
    import numpy as np
    import jax
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.film import accum

    print("backend:", jax.default_backend(), jax.devices())
    scene = builtin_scenes.colonnade().commit(leaf_size=args.leaf)
    w = h = args.res
    camera = builtin_scenes.colonnade_camera(w, h)
    imgs = {}
    for mode in args.modes:
        params = pt.PTParams(max_depth=args.depth, ray_binning=mode)
        t0 = time.time()
        renderer.render_frame(scene, camera, params, w, h, spp=args.spp,
                              seed=0)
        print("%s compile+first: %.1f s" % (mode, time.time() - t0))
        film, stats = renderer.render_frame(scene, camera, params, w, h,
                                            spp=args.spp, seed=1)
        imgs[mode] = np.asarray(accum.resolve(film))
        print("%-8s %dx%d spp=%d depth=%d:  %6.2f Mrps  (%.2f s)"
              % (mode, w, h, args.spp, args.depth, stats.mrps,
                 stats.seconds))
    if len(imgs) == 2:
        a, b = [imgs[m] for m in args.modes[:2]]
        print("identical imgs:", bool((a == b).all()),
              " max|d|:", float(np.abs(a - b).max()))


if __name__ == '__main__':
    main()
