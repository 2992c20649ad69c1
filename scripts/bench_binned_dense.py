"""Treelet-binned dense sweeps vs sorted stack packets, realistic rays.

STALE TIMING -- pre-correction diagnostic: syncs with
`jax.block_until_ready`, a NO-OP on the tunneled axon backend
(README "Measurement correction"), so ms/Mrps columns report
dispatch, not execution.  Kept for the ray-population/kernel
construction; for trustworthy numbers use
scripts/bench_incoherent.py (fetch-synced, input-varied).

Generates bounce-1/bounce-2 diffuse rays and shadow batches on the 92k-tri
colonnade (the incoherent regime that caps the full render) and times:
  - intersect_packet_sorted   (current default)
  - intersect_dense_binned    (rounds 1/2)
  - occluded_packet_sorted vs occluded_dense_binned
with exactness checks against the sorted baseline.

Usage: python scripts/bench_binned_dense.py [--res 1024] [--treelets 64]
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
    ap.add_argument('--treelets', type=int, default=64)
    ap.add_argument('--rt', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend())
    sb = builtin_scenes.colonnade()
    scene = sb.commit(leaf_size=32)
    pk = scene.packet
    nodes, tris = pk['nodes'], pk['tris']
    assert 'planes' in pk, "planes missing (scene too big for VMEM?)"
    planes, rows = pk['planes'], pk['planes_rows']
    tboxes = pk['treelet_boxes']
    tgs, tge = pk['treelet_tile_lo'], pk['treelet_tile_hi']
    print("tris %d  treelets %d  tile spans %s" % (
        scene.num_triangles, tboxes.shape[0],
        np.asarray(tge - tgs).tolist()))

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
        jax.block_until_ready(r.t if hasattr(r, 't') else r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r.t if hasattr(r, 't') else r)
        dt = (time.perf_counter() - t0) / iters
        print("%-46s %9.1f ms  %8.2f Mrps" % (label, dt * 1e3,
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
                       jnp.asarray([0., 0., 1.]),
                       jnp.asarray([1., 0., 0.]))
        tx = jnp.cross(up, nrm)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        ty = jnp.cross(nrm, tx)
        return x[:, None] * tx + y[:, None] * ty + z[:, None] * nrm

    pid = jnp.asarray(order)
    sid = jnp.zeros((n,), jnp.uint32)
    u2p = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(33))
    d1 = cosine_dir(ns, u2p[:, 0], u2p[:, 1])
    o1 = p0 + d1 * 1e-3
    tf1 = jnp.where(valid, jnp.inf, -1.0)

    def binned(o, d, t0_, t1_, rounds):
        return ppt.intersect_dense_binned(
            nodes, tris, planes, rows, tboxes, tgs, tge, o, d, t0_, t1_,
            rounds=rounds, rt=args.rt, **skw)

    from yulio_raytracer_tpu.ops import grid as gridm
    from yulio_raytracer_tpu.scene import GRID_RES
    gd = pk.get('grid')

    def grid_hit(o, d, t0_, t1_, rounds):
        return gridm.intersect_grid(gd, nodes, tris, o, d, t0_, t1_,
                                    res=GRID_RES, rounds=rounds,
                                    rt=args.rt, **skw)

    base1 = timeit("bounce-1 closest sorted", lambda:
                   ppt.intersect_packet_sorted(nodes, tris, o1, d1, tn,
                                               tf1, **skw), n)
    if gd is not None:
        for rounds in (4, 8, 12):
            got = timeit("bounce-1 closest GRID r%d" % rounds,
                         lambda rounds=rounds: grid_hit(o1, d1, tn, tf1,
                                                        rounds), n)
            neq = int((np.asarray(got.tri) != np.asarray(base1.tri))
                      .sum())
            print("   mismatches:", neq)
    for rounds in (1, 2, 3):
        got = timeit("bounce-1 closest dense-binned r%d" % rounds,
                     lambda rounds=rounds: binned(o1, d1, tn, tf1,
                                                  rounds), n)
        ok = bool((np.asarray(got.tri) == np.asarray(base1.tri)).all())
        print("   exact:", ok)

    h1 = base1
    v1 = h1.tri >= 0
    p1 = o1 + h1.t[:, None] * d1
    u2b = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(77))
    dg1 = ops_i.post_intersect(scene.geom, o1, d1, h1)
    ns1 = dg1['Ns']
    ns1 = jnp.where((jnp.sum(ns1 * d1, -1) > 0)[:, None], -ns1, ns1)
    d2 = cosine_dir(ns1, u2b[:, 0], u2b[:, 1])
    o2 = p1 + d2 * 1e-3
    tf2 = jnp.where(v1, jnp.inf, -1.0)
    base2 = timeit("bounce-2 closest sorted", lambda:
                   ppt.intersect_packet_sorted(nodes, tris, o2, d2, tn,
                                               tf2, **skw), n)
    got2 = timeit("bounce-2 closest dense-binned r2",
                  lambda: binned(o2, d2, tn, tf2, 2), n)
    print("   exact:", bool((np.asarray(got2.tri)
                             == np.asarray(base2.tri)).all()))

    # shadow batch at bounce-1 hits, all lights concatenated
    lights = [l for l in scene.lights if l['kind'] == 'triangle']
    nl = len(lights)
    os_, ds_, tns, tfs = [], [], [], []
    for li, l in enumerate(lights):
        u2l = grng.uniform2(jnp.uint32(13), pid, sid, jnp.uint32(40 + li))
        su = jnp.sqrt(u2l[:, :1])
        lp = (l['v0'] * (1 - su) + l['v1'] * (su * (1 - u2l[:, 1:]))
              + l['v2'] * (su * u2l[:, 1:]))
        dvec = lp - p1
        dist = jnp.linalg.norm(dvec, axis=-1)
        dd = dvec / jnp.maximum(dist, 1e-6)[:, None]
        os_.append(p1)
        ds_.append(dd)
        tns.append(jnp.full((n,), 1e-3))
        tfs.append(jnp.where(v1, dist - 1e-3, -1.0))
    so = jnp.concatenate(os_)
    sd = jnp.concatenate(ds_)
    stn = jnp.concatenate(tns)
    stf = jnp.concatenate(tfs)
    ns_rays = nl * n

    obase = timeit("shadow@b1 any-hit sorted", lambda:
                   ppt.occluded_packet_sorted(nodes, tris, so, sd, stn,
                                              stf, **skw), ns_rays)
    if gd is not None:
        for rounds in (2, 4):
            og = timeit("shadow@b1 any-hit GRID r%d" % rounds,
                        lambda rounds=rounds: gridm.occluded_grid(
                            gd, nodes, tris, so, sd, stn, stf,
                            res=GRID_RES, rounds=rounds, rt=args.rt,
                            **skw), ns_rays)
            neq = int((np.asarray(og) != np.asarray(obase)).sum())
            print("   mismatches:", neq)
    for rounds in (1, 2):
        og = timeit("shadow@b1 any-hit dense-binned r%d" % rounds,
                    lambda rounds=rounds: ppt.occluded_dense_binned(
                        nodes, tris, planes, tboxes, tgs, tge, so, sd,
                        stn, stf, rounds=rounds, rt=args.rt, **skw),
                    ns_rays)
        neq = int((np.asarray(og) != np.asarray(obase)).sum())
        # few-per-million f32 tfar-boundary flips are expected between
        # op orders (diag_shadow.py verified vs f64 ground truth)
        print("   mismatches: %d of %d" % (neq, ns_rays))


if __name__ == '__main__':
    main()
