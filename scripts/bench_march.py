"""In-kernel grid march vs sorted stack packets on realistic bounce rays.

STALE TIMING -- pre-correction diagnostic: syncs with
`jax.block_until_ready`, a NO-OP on the tunneled axon backend
(README "Measurement correction"), so ms/Mrps columns report
dispatch, not execution.  Kept for the ray-population/kernel
construction; for trustworthy numbers use
scripts/bench_incoherent.py (fetch-synced, input-varied).

Usage: python scripts/bench_march.py [--res 512] [--kb 8]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--kb', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import grid as gridm
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r
    from yulio_raytracer_tpu.scene import GRID_RES

    print("backend:", jax.default_backend())
    scene = builtin_scenes.colonnade().commit(leaf_size=32)
    pk = scene.packet
    nodes, tris = pk['nodes'], pk['tris']
    gd = pk['grid']
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
              use_cull=scene.any_cull)
    skw = dict(bbox_lo=scene.bbox_lo, bbox_hi=scene.bbox_hi, **kw)

    w = h = args.res
    n = w * h
    camera = builtin_scenes.colonnade_camera(w, h)
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    hit = ppt.intersect_packet(nodes, tris, org, dirn, tn, tf, **kw)
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
    ns = dg['Ns']
    ns = jnp.where((jnp.sum(ns * dirn, -1) > 0)[:, None], -ns, ns)
    pid = jnp.asarray(order)
    sid = jnp.zeros((n,), jnp.uint32)
    u2p = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(33))
    r_ = jnp.sqrt(u2p[:, 0])
    phi = 2 * np.pi * u2p[:, 1]
    up = jnp.where((jnp.abs(ns[:, 2]) < 0.9)[:, None],
                   jnp.asarray([0., 0., 1.]), jnp.asarray([1., 0., 0.]))
    tx = jnp.cross(up, ns)
    tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
    ty = jnp.cross(ns, tx)
    d1 = ((r_ * jnp.cos(phi))[:, None] * tx
          + (r_ * jnp.sin(phi))[:, None] * ty
          + jnp.sqrt(jnp.maximum(1 - u2p[:, 0], 0.0))[:, None] * ns)
    o1 = p0 + d1 * 1e-3
    tf1 = jnp.where(valid, jnp.inf, -1.0)

    def timeit(label, fn, rays, iters=3):
        r = fn()
        jax.block_until_ready(r.t if hasattr(r, 't') else r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r.t if hasattr(r, 't') else r)
        dt = (time.perf_counter() - t0) / iters
        print("%-42s %9.1f ms  %8.2f Mrps" % (label, dt * 1e3,
                                              rays / dt / 1e6))
        return r

    base = timeit("bounce-1 closest sorted", lambda:
                  ppt.intersect_packet_sorted(nodes, tris, o1, d1, tn,
                                              tf1, **skw), n)
    got = timeit("bounce-1 closest MARCH kb=%d" % args.kb, lambda:
                 gridm.intersect_march(gd, o1, d1, tn, tf1,
                                       scene.bbox_lo, scene.bbox_hi,
                                       res=GRID_RES, kb=args.kb,
                                       use_cull=scene.any_cull), n)
    neq = int((np.asarray(got.tri) != np.asarray(base.tri)).sum())
    print("   mismatches: %d of %d" % (neq, n))

    # camera rays through the march (coherent regime sanity)
    cam = timeit("camera closest MARCH", lambda:
                 gridm.intersect_march(gd, org, dirn, tn, tf,
                                       scene.bbox_lo, scene.bbox_hi,
                                       res=GRID_RES, kb=args.kb,
                                       use_cull=scene.any_cull), n)
    neq = int((np.asarray(cam.tri) != np.asarray(hit.tri)).sum())
    print("   camera mismatches: %d of %d" % (neq, n))


if __name__ == '__main__':
    main()
