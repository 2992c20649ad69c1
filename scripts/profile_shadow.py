"""Shadow-key + leaf-size measurements on realistic bounce-1 rays.

STALE TIMING -- pre-correction diagnostic: syncs with
`jax.block_until_ready`, a NO-OP on the tunneled axon backend
(README "Measurement correction"), so ms/Mrps columns report
dispatch, not execution.  Kept for the ray-population/kernel
construction; for trustworthy numbers use
scripts/bench_incoherent.py (fetch-synced, input-varied).

Usage: python scripts/profile_shadow.py [--res 1024] [--leaf 32]
       [--leaf-sweep 16]
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
    ap.add_argument('--leaf', type=int, default=32)
    ap.add_argument('--leaf-sweep', type=int, nargs='*', default=[16])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend(), jax.devices())
    sb = builtin_scenes.colonnade()
    scene = sb.commit(leaf_size=args.leaf)
    nodes, tris = scene.packet['nodes'], scene.packet['tris']
    print("tris %d  nodes %d  leaf %d" % (
        scene.num_triangles, nodes.shape[0], scene.leaf_size))

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
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
              use_cull=scene.any_cull)
    skw = dict(bbox_lo=scene.bbox_lo, bbox_hi=scene.bbox_hi, **kw)

    def timeit(label, fn, rays, iters=3):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(
            r[0] if isinstance(r, (tuple, list)) else
            (r.t if hasattr(r, 't') else r))
        dt = (time.perf_counter() - t0) / iters
        print("%-40s %9.1f ms  %8.2f Mrps" % (label, dt * 1e3,
                                              rays / dt / 1e6))
        return r

    hit = ppt.intersect_packet(nodes, tris, org, dirn, tn, tf, **kw)
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
    ns = dg['Ns']
    ns = jnp.where((jnp.sum(ns * dirn, -1) > 0)[:, None], -ns, ns)

    def cosine_dir(nrm, u1, u2):
        r_ = jnp.sqrt(u1)
        phi = 2 * np.pi * u2
        x = r_ * jnp.cos(phi)
        y = r_ * jnp.sin(phi)
        z = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
        up = jnp.where((jnp.abs(nrm[:, 2]) < 0.9)[:, None],
                       jnp.asarray([0., 0., 1.]), jnp.asarray([1., 0., 0.]))
        tx = jnp.cross(up, nrm)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        ty = jnp.cross(nrm, tx)
        return (x[:, None] * tx + y[:, None] * ty + z[:, None] * nrm)

    pid = jnp.asarray(order)
    sid = jnp.zeros((n,), jnp.uint32)
    u2p = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(33))
    d1 = cosine_dir(ns, u2p[:, 0], u2p[:, 1])
    o1 = p0 + d1 * 1e-3
    tf1 = jnp.where(valid, jnp.inf, -1.0)
    h1 = ppt.intersect_packet_sorted(nodes, tris, o1, d1, tn, tf1, **skw)
    v1 = h1.tri >= 0
    p1 = o1 + h1.t[:, None] * d1

    lights = [l for l in scene.lights if l['kind'] == 'triangle']
    nl = len(lights)

    def shadow_batch(p, valid_m, seed):
        os_, ds_, tns, tfs = [], [], [], []
        for li, l in enumerate(lights):
            u2l = grng.uniform2(jnp.uint32(seed), pid, sid,
                                jnp.uint32(40 + li))
            su = jnp.sqrt(u2l[:, :1])
            lp = (l['v0'] * (1 - su) + l['v1'] * (su * (1 - u2l[:, 1:]))
                  + l['v2'] * (su * u2l[:, 1:]))
            dvec = lp - p
            dist = jnp.linalg.norm(dvec, axis=-1)
            dd = dvec / jnp.maximum(dist, 1e-6)[:, None]
            os_.append(p)
            ds_.append(dd)
            tns.append(jnp.full((n,), 1e-3))
            tfs.append(jnp.where(valid_m, dist - 1e-3, -1.0))
        return (jnp.concatenate(os_), jnp.concatenate(ds_),
                jnp.concatenate(tns), jnp.concatenate(tfs))

    so1, sd1, stn1, stf1 = shadow_batch(p1, v1, 12)
    ns_rays = nl * n
    seg = jnp.repeat(jnp.arange(nl, dtype=jnp.uint32), n)

    base = timeit("shadow@b1 sorted (no seg)",
                  lambda: ppt.occluded_packet_sorted(
                      nodes, tris, so1, sd1, stn1, stf1, **skw), ns_rays)
    withseg = timeit("shadow@b1 sorted (light-seg key)",
                     lambda: ppt.occluded_packet_sorted(
                         nodes, tris, so1, sd1, stn1, stf1, seg=seg,
                         **skw), ns_rays)
    neq = int((np.asarray(base) != np.asarray(withseg)).sum())
    # a handful of per-mille-of-epsilon boundary flips are expected: rays
    # whose nearest occluder sits within f32 rounding of tfar resolve
    # differently under different op orders (verified against f64 host
    # ground truth by scripts/diag_shadow.py — all such rays are grazing
    # the 1e-3 shadow epsilon)
    print("   seg mismatches: %d of %d (f32 tfar-boundary flips)"
          % (neq, ns_rays))

    # shadow@b0 (tile-coherent): does the seg key beat raw unsorted?
    so0, sd0, stn0, stf0 = shadow_batch(p0, valid, 11)
    timeit("shadow@b0 UNsorted", lambda: ppt.occluded_packet(
        nodes, tris, so0, sd0, stn0, stf0, **kw), ns_rays)
    timeit("shadow@b0 sorted (light-seg key)",
           lambda: ppt.occluded_packet_sorted(
               nodes, tris, so0, sd0, stn0, stf0, seg=seg, **skw), ns_rays)

    for leaf in args.leaf_sweep:
        s2 = sb.commit(leaf_size=leaf)
        n2, t2 = s2.packet['nodes'], s2.packet['tris']
        kw2 = dict(max_leaf=s2.leaf_size, hbm=s2.packet_hbm,
                   use_cull=s2.any_cull)
        skw2 = dict(bbox_lo=s2.bbox_lo, bbox_hi=s2.bbox_hi, **kw2)
        print("-- leaf %d: %d nodes" % (s2.leaf_size, n2.shape[0]))
        timeit("  leaf%-3d bounce-1 closest sorted" % s2.leaf_size,
               lambda: ppt.intersect_packet_sorted(
                   n2, t2, o1, d1, tn, tf1, **skw2), n)
        timeit("  leaf%-3d camera closest tiled" % s2.leaf_size,
               lambda: ppt.intersect_packet(
                   n2, t2, org, dirn, tn, tf, **kw2), n)
        timeit("  leaf%-3d shadow@b1 seg-sorted" % s2.leaf_size,
               lambda: ppt.occluded_packet_sorted(
                   n2, t2, so1, sd1, stn1, stf1, seg=seg, **skw2), ns_rays)


if __name__ == '__main__':
    main()
