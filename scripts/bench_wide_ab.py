"""On-chip A/B: binary packet kernel vs the BVH4 wide-node kernel
(ops/pallas_wide.py) on identical trees and identical ray populations
(VERDICT r3 item 2 done-criteria: same measured win/loss format as the
round-3 six-way ablation).

Both kernels traverse THE SAME binary FlatBVH (pack_nodes vs pack_nodes4
are two encodings of one tree), so differences are pure kernel
structure: pops, scalar stack traffic, slab-test batching.

Usage: python scripts/bench_wide_ab.py [--res 1024] [--scene colonnade]
       [--leaf 32]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--scene', type=str, default='colonnade')
    ap.add_argument('--leaf', type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.geometry import bvh as gb, mesh as gm
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import pallas_wide as pw
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    sb = getattr(builtin_scenes, args.scene)()
    scene_lights = sb.lights
    camera = getattr(builtin_scenes, args.scene + '_camera')(
        args.res, args.res)
    packed = gm.pack_meshes(sb.meshes)
    tree = gb.build(packed.v0, packed.e1, packed.e2, packed.valid,
                    leaf_size=args.leaf, quality='high')
    host = {k: getattr(packed, k) for k in gb._PER_TRIANGLE_KEYS
            if getattr(packed, k) is not None}
    host = gb.permute_geom(host, tree.order)
    host['woop'] = gm.woop_matrices(host['v0'], host['e1'], host['e2'],
                                    host['valid'])
    nodes = jnp.asarray(ppt.pack_nodes(tree))
    nodes4 = jnp.asarray(pw.pack_nodes4(tree))
    nodes8 = jnp.asarray(pw.pack_nodes8(tree))
    tris = jnp.asarray(ppt.pack_tris(host['woop'], host,
                                     pad_rows=ppt._hbm_window(args.leaf)))
    hbm = tris.nbytes > 12.5 * (1 << 20)
    geom = {k: jnp.asarray(v) for k, v in host.items()}
    print("tree: %d binary nodes -> %d bvh4 / %d bvh8 nodes, "
          "%d tri rows, hbm=%s"
          % (nodes.shape[0], nodes4.shape[0], nodes8.shape[0],
             tris.shape[0], hbm), flush=True)

    # ---- ray populations (camera + sorted bounce-1), built once ----
    w = h = args.res
    n = w * h
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    kw = dict(max_leaf=args.leaf, hbm=hbm)
    hit = ppt.intersect_packet(nodes, tris, org, dirn, tn, tf,
                               use_cull=True, **kw)
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(geom, org, dirn, hit)
    ns = dg['Ns']
    ns = jnp.where((jnp.sum(ns * dirn, -1) > 0)[:, None], -ns, ns)
    u2p = grng.uniform2(jnp.uint32(9), jnp.asarray(order),
                        jnp.zeros((n,), jnp.uint32), jnp.uint32(33))
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
    perm = ppt.hitpoint_sort_perm(o1, jnp.asarray(tree.lo[0]),
                                  jnp.asarray(tree.hi[0]), live=tf1 > 0)
    o1s, d1s = o1[perm], d1[perm]
    tn1s, tf1s = tn[perm], tf1[perm]

    K = 8

    def amortized(fn, label):
        @jax.jit
        def loop(e0):
            def body(i, acc):
                r = fn(e0 + i.astype(jnp.float32) * 1e-7)
                return acc + jnp.sum(jnp.minimum(r, jnp.float32(1e9)))
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        np.asarray(loop(jnp.float32(0.0)).ravel()[:1])
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.float32((i + 1) * 1e-5)).ravel()[:1])
            times.append(time.perf_counter() - t0)
        dt = min(times) / K
        print("  %-30s %8.1f ms  %8.2f Mrps"
              % (label, dt * 1e3, n / dt / 1e6), flush=True)

    def counts(fn, label):
        _, c = fn()
        c = np.asarray(c).astype(np.float64)
        print("  %-30s pops %.0f culled %.0f leafvis %.0f trirows %.0f"
              % (label, c[:, 0].mean(), c[:, 1].mean(), c[:, 2].mean(),
                 c[:, 3].mean()), flush=True)

    print("camera packets (coherent):", flush=True)
    amortized(lambda e: ppt.intersect_packet(
        nodes, tris, org, dirn, tn + e, tf, use_cull=True, **kw).t,
        "binary closest")
    amortized(lambda e: pw.intersect_packet4(
        nodes4, tris, org, dirn, tn + e, tf, use_cull=True, **kw).t,
        "bvh4 closest")
    amortized(lambda e: pw.intersect_packet4(
        nodes8, tris, org, dirn, tn + e, tf, use_cull=True, width=8,
        **kw).t, "bvh8 closest")

    print("bounce-1 sorted (incoherent):", flush=True)
    amortized(lambda e: ppt.intersect_packet(
        nodes, tris, o1s, d1s, tn1s + e, tf1s, use_cull=True, **kw).t,
        "binary closest")
    amortized(lambda e: pw.intersect_packet4(
        nodes4, tris, o1s, d1s, tn1s + e, tf1s, use_cull=True, **kw).t,
        "bvh4 closest")
    amortized(lambda e: pw.intersect_packet4(
        nodes8, tris, o1s, d1s, tn1s + e, tf1s, use_cull=True, width=8,
        **kw).t, "bvh8 closest")
    counts(lambda: ppt.intersect_packet(
        nodes, tris, o1s, d1s, tn1s, tf1s, use_cull=True,
        debug_counts=True, **kw), "binary")
    counts(lambda: pw.intersect_packet4(
        nodes4, tris, o1s, d1s, tn1s, tf1s, use_cull=True,
        debug_counts=True, **kw), "bvh4")
    counts(lambda: pw.intersect_packet4(
        nodes8, tris, o1s, d1s, tn1s, tf1s, use_cull=True, width=8,
        debug_counts=True, **kw), "bvh8")

    # shadow rays from bounce-0 hits toward one sampled light
    lights = [l for l in scene_lights if l['kind'] == 'triangle']
    if lights:
        l = lights[0]
        u2l = grng.uniform2(jnp.uint32(11), jnp.asarray(order),
                            jnp.zeros((n,), jnp.uint32), jnp.uint32(40))
        su = jnp.sqrt(u2l[:, :1])
        lp = (jnp.asarray(l['v0']) * (1 - su)
              + jnp.asarray(l['v1']) * (su * (1 - u2l[:, 1:]))
              + jnp.asarray(l['v2']) * (su * u2l[:, 1:]))
        dvec = lp - p0
        dist = jnp.linalg.norm(dvec, axis=-1)
        sd = dvec / jnp.maximum(dist, 1e-6)[:, None]
        stn = jnp.full((n,), 1e-3)
        stf = jnp.where(valid, dist - 1e-3, -1.0)
        sperm = ppt.hitpoint_sort_perm(p0, jnp.asarray(tree.lo[0]),
                                       jnp.asarray(tree.hi[0]),
                                       live=stf > 0)
        sos, sds = p0[sperm], sd[sperm]
        stns, stfs = stn[sperm], stf[sperm]
        print("shadow@b0 any-hit (sorted):", flush=True)
        amortized(lambda e: ppt.occluded_packet(
            nodes, tris, sos, sds, stns + e, stfs, use_cull=True,
            **kw).astype(jnp.float32), "binary any-hit")
        amortized(lambda e: pw.occluded_packet4(
            nodes4, tris, sos, sds, stns + e, stfs, use_cull=True,
            **kw).astype(jnp.float32), "bvh4 any-hit")
        amortized(lambda e: pw.occluded_packet4(
            nodes8, tris, sos, sds, stns + e, stfs, use_cull=True,
            width=8, **kw).astype(jnp.float32), "bvh8 any-hit")


if __name__ == '__main__':
    main()
