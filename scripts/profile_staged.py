"""Staged-t traversal A/B on realistic bounce/shadow rays (colonnade).

STALE TIMING -- pre-correction diagnostic: syncs with
`jax.block_until_ready`, a NO-OP on the tunneled axon backend
(README "Measurement correction"), so ms/Mrps columns report
dispatch, not execution.  Kept for the ray-population/kernel
construction; for trustworthy numbers use
scripts/bench_incoherent.py (fetch-synced, input-varied).

Compares plain-sorted vs staged-t for bounce-1/2 closest and bounce-1
shadow any-hit, over a few stage schedules.

Usage: python scripts/profile_staged.py [--res 1024] [--leaf 32]
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
    dg1 = ops_i.post_intersect(scene.geom, o1, d1, h1)
    ns1 = dg1['Ns']
    ns1 = jnp.where((jnp.sum(ns1 * d1, -1) > 0)[:, None], -ns1, ns1)
    u2q = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(34))
    d2 = cosine_dir(ns1, u2q[:, 0], u2q[:, 1])
    o2 = p1 + d2 * 1e-3
    tf2 = jnp.where(v1, jnp.inf, -1.0)

    lights = [l for l in scene.lights if l['kind'] == 'triangle']

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
    ns_rays = 4 * n

    rb1 = timeit("base bounce-1 closest (sorted)",
                 lambda: ppt.intersect_packet_sorted(
                     nodes, tris, o1, d1, tn, tf1, **skw), n)
    rb2 = timeit("base bounce-2 closest (sorted)",
                 lambda: ppt.intersect_packet_sorted(
                     nodes, tris, o2, d2, tn, tf2, **skw), n)
    rsh = timeit("base shadow@b1 any-hit (sorted)",
                 lambda: ppt.occluded_packet_sorted(
                     nodes, tris, so1, sd1, stn1, stf1, **skw), ns_rays)

    for stages in ((0.07, 0.3), (0.03, 0.12, 0.4), (0.15,)):
        tag = "/".join("%g" % s for s in stages)
        g1 = timeit("staged(%s) bounce-1 closest" % tag,
                    lambda: ppt.intersect_packet_staged(
                        nodes, tris, o1, d1, tn, tf1, stages=stages,
                        **skw), n)
        g2 = timeit("staged(%s) bounce-2 closest" % tag,
                    lambda: ppt.intersect_packet_staged(
                        nodes, tris, o2, d2, tn, tf2, stages=stages,
                        **skw), n)
        gs = timeit("staged(%s) shadow@b1 any-hit" % tag,
                    lambda: ppt.occluded_packet_staged(
                        nodes, tris, so1, sd1, stn1, stf1, stages=stages,
                        **skw), ns_rays)
        ok1 = bool((np.asarray(rb1.tri) == np.asarray(g1.tri)).all())
        ok2 = bool((np.asarray(rb2.tri) == np.asarray(g2.tri)).all())
        oks = bool((np.asarray(rsh) == np.asarray(gs)).all())
        print("   exactness b1/b2/shadow:", ok1, ok2, oks)


if __name__ == '__main__':
    main()
