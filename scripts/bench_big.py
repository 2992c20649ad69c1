"""Multi-million-triangle scene through the HBM-streaming packet path.

Embree's headline capability is DRAM-resident BVHs over multi-million-
triangle scenes; this drives the same scale end-to-end on one v5e chip:
host binned-SAH build (leaf auto-grown until the node table fits SMEM),
HBM-resident triangle rows with DMA-streamed leaf windows, full render.

Usage: python scripts/bench_big.py [--cols 16 8] [--tess 32 48]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cols', type=int, nargs=2, default=[16, 8])
    ap.add_argument('--tess', type=int, nargs=2, default=[32, 48])
    ap.add_argument('--clutter', type=int, default=96)
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--spp', type=int, default=4)
    ap.add_argument('--depth', type=int, default=2)
    args = ap.parse_args()

    import jax
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.film import accum

    print("backend:", jax.default_backend())
    t0 = time.time()
    sb = builtin_scenes.colonnade(cols_x=args.cols[0], cols_z=args.cols[1],
                                  tess=tuple(args.tess),
                                  clutter=args.clutter)
    t1 = time.time()
    scene = sb.commit(leaf_size=32)
    t2 = time.time()
    pk = scene.packet
    print("tris %d  nodes %d  leaf %d  hbm %s  tris-bytes %.1f MB" % (
        scene.num_triangles, pk['nodes'].shape[0], scene.leaf_size,
        scene.packet_hbm, pk['tris'].nbytes / 1e6))
    print("build: scene %.1fs  commit(BVH+pack) %.1fs" % (t1 - t0,
                                                          t2 - t1))

    w = h = args.res
    camera = builtin_scenes.colonnade_camera(w, h)
    params = pt.PTParams(max_depth=args.depth)
    film, _ = renderer.render_frame(scene, camera, params, w, h,
                                    spp=args.spp, seed=0)
    film, stats = renderer.render_frame(scene, camera, params, w, h,
                                        spp=args.spp, seed=1)
    img = np.asarray(accum.resolve(film))
    print("render %dx%d spp=%d depth=%d: %.2f Mrps  (%.1f s)  "
          "img mean %.4f finite %s" % (
          w, h, args.spp, args.depth, stats.mrps, stats.seconds,
          img.mean(), bool(np.isfinite(img).all())))


if __name__ == '__main__':
    main()
