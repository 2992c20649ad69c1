"""Traversal micro-benchmark on the large (colonnade) scene.

STALE TIMING -- pre-correction diagnostic: syncs with
`jax.block_until_ready`, a NO-OP on the tunneled axon backend
(README "Measurement correction"), so ms/Mrps columns report
dispatch, not execution.  Kept for the ray-population/kernel
construction; for trustworthy numbers use
scripts/bench_incoherent.py (fetch-synced, input-varied).

Measures the Pallas packet kernels in isolation (closest-hit and any-hit)
plus the full render step, on whatever backend is live.  Use on the real
TPU to track the north-star regime (BASELINE.md: Sponza 1024x1024, 64 spp).

Usage: python scripts/bench_traverse.py [--res 1024] [--spp 4]
"""
import argparse
import sys
import time
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--spp', type=int, default=4)
    ap.add_argument('--depth', type=int, default=4)
    ap.add_argument('--skip-render', action='store_true')
    ap.add_argument('--leaf', type=int, default=64)
    ap.add_argument('--scanline', action='store_true')
    ap.add_argument('--tess', type=int, nargs=2, default=(24, 32))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer

    print("backend:", jax.default_backend(), jax.devices())
    sb = builtin_scenes.colonnade(tess=tuple(args.tess))
    scene = sb.commit(leaf_size=args.leaf)
    print("triangles:", scene.num_triangles,
          "nodes:", None if scene.packet is None or 'nodes' not in scene.packet
          else scene.packet['nodes'].shape)

    w = h = args.res
    camera = builtin_scenes.colonnade_camera(w, h)

    # primary rays for the whole frame.  Packet coherence depends on ray
    # ORDER: scanline packets are 1024x1 strips (a full image row — the
    # packet frustum fans across the whole scene); tiled packets are 32x32
    # pixel blocks (tight frusta -> real culling).
    n = w * h
    idx = np.arange(n)
    if not args.scanline:
        t_ = 32                      # 32x32 = BLOCK pixels per packet
        tiles_x = w // t_
        tile = idx // (t_ * t_)
        lane = idx % (t_ * t_)
        tx, ty = tile % tiles_x, tile // tiles_x
        px = jnp.asarray((tx * t_ + lane % t_).astype(np.float32))
        py = jnp.asarray((ty * t_ + lane // t_).astype(np.float32))
    else:
        px = (jnp.arange(n) % w).astype(jnp.float32)
        py = (jnp.arange(n) // w).astype(jnp.float32)
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)

    nodes, tris = scene.packet['nodes'], scene.packet['tris']
    print("nodes %s (%.2f MB)  tris %s (%.2f MB)" % (
        nodes.shape, nodes.size * 4 / 1e6, tris.shape, tris.size * 4 / 1e6))

    def timeit(label, fn, rays):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        dt = (time.time() - t0) / iters
        print("%-24s %8.1f ms   %8.2f Mrps" % (label, dt * 1e3,
                                               rays / dt / 1e6))
        return r

    hit = timeit("intersect_packet", lambda: ppt.intersect_packet(
        nodes, tris, org, dirn, tn, tf, max_leaf=scene.leaf_size), n)
    frac = float(jnp.mean((hit.tri >= 0).astype(jnp.float32)))
    print("  primary hit fraction: %.3f" % frac)

    timeit("occluded_packet", lambda: ppt.occluded_packet(
        nodes, tris, org, dirn, tn, jnp.full((n,), 6.0),
        max_leaf=scene.leaf_size), n)

    # incoherent load: random origins in the hall, random directions
    # (the shape of bounce>=1 wavefront rays)
    rs = np.random.RandomState(1)
    org_i = jnp.asarray(
        rs.uniform(-1, 1, (n, 3)).astype(np.float32) * [9.0, 2.8, 4.5]
        + [0, 3, 0])
    d_i = rs.randn(n, 3).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    d_i = jnp.asarray(d_i)
    timeit("intersect incoherent", lambda: ppt.intersect_packet(
        nodes, tris, org_i, d_i, tn, tf, max_leaf=scene.leaf_size), n)
    timeit("occluded incoherent", lambda: ppt.occluded_packet(
        nodes, tris, org_i, d_i, tn, jnp.full((n,), 6.0),
        max_leaf=scene.leaf_size), n)
    timeit("intersect incoh+sort", lambda: ppt.intersect_packet_sorted(
        nodes, tris, org_i, d_i, tn, tf, scene.bbox_lo, scene.bbox_hi,
        max_leaf=scene.leaf_size), n)
    timeit("occluded incoh+sort", lambda: ppt.occluded_packet_sorted(
        nodes, tris, org_i, d_i, tn, jnp.full((n,), 6.0),
        scene.bbox_lo, scene.bbox_hi, max_leaf=scene.leaf_size), n)
    # shadow-like: coherent tile origins (first-hit points), directions
    # toward one light point
    hitp = org + hit.t[:, None] * dirn
    lp = jnp.asarray([[-5.0, 5.9, 0.0]])
    d_s = lp - hitp
    dist = jnp.linalg.norm(d_s, axis=1, keepdims=True)
    d_s = d_s / jnp.maximum(dist, 1e-6)
    timeit("occluded to-light", lambda: ppt.occluded_packet(
        nodes, tris, hitp, d_s, jnp.full((n,), 1e-3),
        dist[:, 0] - 1e-3, max_leaf=scene.leaf_size), n)

    if not args.skip_render:
        params = pt.PTParams(max_depth=args.depth)
        t0 = time.time()
        renderer.render_frame(scene, camera, params, w, h, spp=args.spp,
                              seed=0)
        print("render compile+run: %.1f s" % (time.time() - t0))
        film, stats = renderer.render_frame(scene, camera, params, w, h,
                                            spp=args.spp, seed=1)
        print("render_frame %dx%d spp=%d depth=%d: %.2f Mrps, %.2f s" % (
            w, h, args.spp, args.depth, stats.mrps, stats.seconds))


if __name__ == '__main__':
    main()
