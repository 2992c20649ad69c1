"""Trustworthy incoherent-traversal timings: every timed call gets a
DIFFERENT input (tnear jittered per iteration, same shapes) so backend
execution caching/dedup cannot fake a result, and each call is
block_until_ready'd individually.

Usage: python scripts/bench_incoherent.py [--res 512] [--iters 4]
       [--what sorted,march,grid,occ]
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
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--kb', type=int, default=8)
    ap.add_argument('--what', type=str,
                    default='sorted,march,grid')
    args = ap.parse_args()
    what = args.what.split(',')

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

    print("backend:", jax.default_backend(), flush=True)
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
    print("primary hit rate:", float(jnp.mean(valid.astype(jnp.float32))),
          flush=True)
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

    def timeit(label, fn, rays, iters=args.iters):
        # warmup (compile) with eps=0
        r = fn(0.0)
        jax.block_until_ready(r.t if hasattr(r, 't') else r)
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            r = fn(1e-7 * (i + 1))        # distinct input every call
            jax.block_until_ready(r.t if hasattr(r, 't') else r)
            times.append(time.perf_counter() - t0)
        best = min(times)
        med = sorted(times)[len(times) // 2]
        print("%-34s best %8.1f ms  med %8.1f ms  %8.2f Mrps"
              % (label, best * 1e3, med * 1e3, rays / best / 1e6),
              flush=True)
        return r

    if 'sorted' in what:
        base = timeit("bounce-1 closest sorted", lambda e:
                      ppt.intersect_packet_sorted(nodes, tris, o1, d1,
                                                  tn + e, tf1, **skw), n)
    if 'march' in what:
        got = timeit("bounce-1 closest MARCH kb=%d" % args.kb, lambda e:
                     gridm.intersect_march(gd, o1, d1, tn + e, tf1,
                                           scene.bbox_lo, scene.bbox_hi,
                                           res=GRID_RES, kb=args.kb,
                                           use_cull=scene.any_cull), n)
        if 'sorted' in what:
            neq = int((np.asarray(got.tri) != np.asarray(base.tri)).sum())
            print("   march vs sorted mismatches: %d of %d" % (neq, n),
                  flush=True)
    if 'grid' in what:
        timeit("bounce-1 closest GRID rounds", lambda e:
               gridm.intersect_grid(gd, nodes, tris, o1, d1, tn + e, tf1,
                                    scene.bbox_lo, scene.bbox_hi,
                                    res=GRID_RES, **kw), n)
    if 'occ' in what:
        timeit("bounce-1 anyhit sorted", lambda e:
               ppt.occluded_packet_sorted(nodes, tris, o1, d1, tn + e,
                                          tf1, **skw), n)
    if 'coherent' in what:
        timeit("camera closest packet", lambda e:
               ppt.intersect_packet(nodes, tris, org, dirn, tn + e, tf,
                                    **kw), n)


if __name__ == '__main__':
    main()
