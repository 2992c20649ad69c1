"""Trustworthy traversal timings.

Measurement rules (established round 3, scripts/bench_primitives.py):
* `jax.block_until_ready` does NOT wait on the tunneled axon backend —
  every timing must force completion with a host fetch of (a slice of)
  the result, which costs one ~30 ms RPC round trip.
* every timed call gets a DIFFERENT input (tnear jittered per
  iteration) so backend execution caching/dedup cannot fake a result.
* `--amortize K` wraps the op in an in-jit lax.fori_loop of K
  input-varied iterations and divides out the single fetch, resolving
  costs well below the RPC floor.

Usage: python scripts/bench_incoherent.py [--res 512] [--iters 3]
       [--amortize 8] [--what sorted,unsorted,occ,coherent,grid,march]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def fetch(x):
    import numpy as np
    if hasattr(x, 't'):
        x = x.t
    if isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(x.ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--amortize', type=int, default=8)
    ap.add_argument('--kb', type=int, default=8)
    ap.add_argument('--leaf', type=int, default=32)
    ap.add_argument('--what', type=str,
                    default='coherent,sorted,unsorted,occ')
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
    scene = builtin_scenes.colonnade().commit(leaf_size=args.leaf)
    pk = scene.packet
    nodes, tris = pk['nodes'], pk['tris']
    gd = pk.get('grid')
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

    K = max(args.amortize, 1)

    def timeit(label, fn, rays, iters=args.iters):
        """fn(eps scalar) -> Hit or array.  Reports per-call time with
        the RPC floor amortized over K in-jit iterations."""
        @jax.jit
        def loop(e0):
            def body(i, acc):
                r = fn(e0 + i.astype(jnp.float32) * 1e-7)
                t = r.t if hasattr(r, 't') else r
                return acc + jnp.sum(jnp.minimum(t.astype(jnp.float32),
                                                 jnp.float32(1e9)))
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        fetch(loop(jnp.float32(0.0)))          # compile + warm
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            fetch(loop(jnp.float32((i + 1) * 1e-5)))
            times.append(time.perf_counter() - t0)
        best = min(times) / K
        med = sorted(times)[len(times) // 2] / K
        print("%-34s best %8.1f ms  med %8.1f ms  %8.2f Mrps"
              % (label, best * 1e3, med * 1e3, rays / best / 1e6),
              flush=True)

    if 'coherent' in what:
        timeit("camera closest packet", lambda e:
               ppt.intersect_packet(nodes, tris, org, dirn, tn + e, tf,
                                    **kw), n)
    if 'sorted' in what:
        timeit("bounce-1 closest sorted", lambda e:
               ppt.intersect_packet_sorted(nodes, tris, o1, d1,
                                           tn + e, tf1, **skw), n)
    if 'unsorted' in what:
        timeit("bounce-1 closest unsorted", lambda e:
               ppt.intersect_packet(nodes, tris, o1, d1, tn + e, tf1,
                                    **kw), n)
    if 'occ' in what:
        timeit("bounce-1 anyhit sorted", lambda e:
               ppt.occluded_packet_sorted(nodes, tris, o1, d1, tn + e,
                                          tf1, **skw), n)
    if 'split' in what:
        from yulio_raytracer_tpu.ops import pallas_splitleaf as psl
        timeit("bounce-1 closest SPLIT sorted", lambda e:
               psl.intersect_packet_split_sorted(
                   nodes, tris, o1, d1, tn + e, tf1,
                   bbox_lo=scene.bbox_lo, bbox_hi=scene.bbox_hi,
                   max_leaf=scene.leaf_size, use_cull=scene.any_cull), n)
        timeit("camera closest SPLIT", lambda e:
               psl.intersect_packet_split(
                   nodes, tris, org, dirn, tn + e, tf,
                   max_leaf=scene.leaf_size, use_cull=scene.any_cull), n)
    if 'treelet' in what:
        timeit("bounce-1 closest treelet-binned", lambda e:
               ppt.intersect_packet_binned(
                   nodes, tris, pk['treelet_roots'], pk['treelet_boxes'],
                   o1, d1, tn + e, tf1, **skw), n)
    if 'dense' in what and 'planes' in pk:
        timeit("bounce-1 closest dense-binned", lambda e:
               ppt.intersect_dense_binned(
                   nodes, tris, pk['planes'], pk['planes_rows'],
                   pk['treelet_boxes'], pk['treelet_tile_lo'],
                   pk['treelet_tile_hi'], o1, d1, tn + e, tf1, **skw), n)
    if 'regroup' in what:
        keyu = jnp.asarray(
            np.random.RandomState(1).randint(
                0, 1 << 30, size=n).astype(np.uint32))
        timeit("argsort u32", lambda e:
               jnp.argsort(keyu + (e * 1e7).astype(jnp.uint32)
                           ).astype(jnp.float32), n)
        perm = jnp.argsort(keyu)
        timeit("gather rows (R,3)", lambda e:
               (o1 + e)[perm], n)
        timeit("scatter rows", lambda e:
               jnp.zeros_like(o1).at[perm].set(o1 + e), n)
    if 'grid' in what and gd is not None:
        timeit("bounce-1 closest GRID rounds", lambda e:
               gridm.intersect_grid(gd, nodes, tris, o1, d1, tn + e, tf1,
                                    scene.bbox_lo, scene.bbox_hi,
                                    res=GRID_RES, **kw), n)
    if 'march' in what and gd is not None:
        timeit("bounce-1 closest MARCH kb=%d" % args.kb, lambda e:
               gridm.intersect_march(gd, o1, d1, tn + e, tf1,
                                     scene.bbox_lo, scene.bbox_hi,
                                     res=GRID_RES, kb=args.kb,
                                     use_cull=scene.any_cull), n)


if __name__ == '__main__':
    main()
