"""Phase-level profile of the north-star render regime (colonnade 1024^2).

STALE TIMING — round-2 diagnostic, kept for the phase/ray-population
construction.  It syncs with `jax.block_until_ready`, which is a NO-OP
on the tunneled axon backend (see README "Measurement correction"), so
its ms/Mrps columns report DISPATCH time, not execution.  For
trustworthy phase timings use `scripts/bench_incoherent.py`
(fetch-based syncs, input-varied iterations, in-jit amortization).

Times each ray phase of a depth-4 path-traced frame IN ISOLATION with
realistic ray populations (real first-hit geometry, cosine-scattered
bounce rays, real light-sample shadow rays), so the frame budget can be
attributed:  camera closest / bounce closest / bounce-0 shadows /
bounce-N shadows / the argsort binning itself.

Also sweeps the wavefront sort key variants (XLA-side, no kernel
recompile) and leaf sizes (kernel recompile each, slow on first call).

Usage: python scripts/profile_phases.py [--res 1024] [--leaf 32]
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
    ap.add_argument('--leaf-sweep', type=int, nargs='*', default=[])
    ap.add_argument('--skip-render', action='store_true')
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
        print("%-34s %9.1f ms  %8.2f Mrps" % (label, dt * 1e3,
                                              rays / dt / 1e6))
        return r, dt

    # ---- phase A: camera closest (tiled coherent) ----
    hit, t_a = timeit("A camera closest (tiled)",
                      lambda: ppt.intersect_packet(
                          nodes, tris, org, dirn, tn, tf, **kw), n)

    # first-hit geometry
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
    ns = dg['Ns']
    ns = jnp.where((jnp.sum(ns * dirn, -1) > 0)[:, None], -ns, ns)

    # ---- bounce-1 rays: cosine hemisphere about the shading normal ----
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
    u1 = grng.uniform1(jnp.uint32(9), pid, sid, jnp.uint32(32))
    u2p = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(33))
    d1 = cosine_dir(ns, u2p[:, 0], u2p[:, 1])
    o1 = p0 + d1 * 1e-3
    tf1 = jnp.where(valid, jnp.inf, -1.0)

    timeit("B bounce-1 closest (sorted)",
           lambda: ppt.intersect_packet_sorted(
               nodes, tris, o1, d1, tn, tf1, **skw), n)
    timeit("B'bounce-1 closest (UNsorted)",
           lambda: ppt.intersect_packet(
               nodes, tris, o1, d1, tn, tf1, **kw), n)

    # bounce-2 rays: scatter again from bounce-1 hits (fully incoherent)
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
    timeit("C bounce-2 closest (sorted)",
           lambda: ppt.intersect_packet_sorted(
               nodes, tris, o2, d2, tn, tf2, **skw), n)

    # ---- shadow rays: to a sampled point on each of the 4 light tris ----
    lights = [l for l in scene.lights if l['kind'] == 'triangle']
    print("lights:", len(lights))

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

    so, sd, stn, stf = shadow_batch(p0, valid, 11)
    ns_rays = 4 * n
    timeit("D shadow@b0 any-hit (sorted)",
           lambda: ppt.occluded_packet_sorted(
               nodes, tris, so, sd, stn, stf, **skw), ns_rays)
    timeit("D'shadow@b0 any-hit (UNsorted)",
           lambda: ppt.occluded_packet(
               nodes, tris, so, sd, stn, stf, **kw), ns_rays)

    so1, sd1, stn1, stf1 = shadow_batch(p1, v1, 12)
    timeit("E shadow@b1 any-hit (sorted)",
           lambda: ppt.occluded_packet_sorted(
               nodes, tris, so1, sd1, stn1, stf1, **skw), ns_rays)
    timeit("E'shadow@b1 any-hit (UNsorted)",
           lambda: ppt.occluded_packet(
               nodes, tris, so1, sd1, stn1, stf1, **kw), ns_rays)
    h2 = ppt.intersect_packet_sorted(nodes, tris, o2, d2, tn, tf2, **skw)
    p2 = o2 + h2.t[:, None] * d2
    so2, sd2, stn2, stf2 = shadow_batch(p2, v1 & (h2.tri >= 0), 13)
    timeit("E2 shadow@b2-ish (sorted)",
           lambda: ppt.occluded_packet_sorted(
               nodes, tris, so2, sd2, stn2, stf2, **skw), ns_rays)
    timeit("E2'shadow@b2-ish (UNsorted)",
           lambda: ppt.occluded_packet(
               nodes, tris, so2, sd2, stn2, stf2, **kw), ns_rays)

    # ---- treelet-binned wavefront (the incoherent-ray fix) ----
    if 'treelet_roots' in scene.packet:
        troots = scene.packet['treelet_roots']
        tboxes = scene.packet['treelet_boxes']
        print("treelets:", int(troots.shape[0]))
        for rounds in (1, 2):
            timeit("G bounce-1 closest binned r%d" % rounds,
                   lambda: ppt.intersect_packet_binned(
                       nodes, tris, troots, tboxes, o1, d1, tn, tf1,
                       rounds=rounds, **skw), n)
            timeit("G bounce-2 closest binned r%d" % rounds,
                   lambda: ppt.intersect_packet_binned(
                       nodes, tris, troots, tboxes, o2, d2, tn, tf2,
                       rounds=rounds, **skw), n)
            timeit("G shadow@b1 any-hit binned r%d" % rounds,
                   lambda: ppt.occluded_packet_binned(
                       nodes, tris, troots, tboxes, so1, sd1, stn1, stf1,
                       rounds=rounds, **skw), ns_rays)

    # ---- sort cost alone ----
    key = ppt._ray_sort_key(o1, d1, scene.bbox_lo, scene.bbox_hi)

    def sort_only():
        perm = jnp.argsort(key)
        return o1[perm]
    timeit("F argsort+gather 1M rays", sort_only, n)

    key4 = ppt._ray_sort_key(so1, sd1, scene.bbox_lo, scene.bbox_hi)

    def sort_only4():
        perm = jnp.argsort(key4)
        return so1[perm]
    timeit("F'argsort+gather 4M rays", sort_only4, ns_rays)

    # ---- sort-key variants (traversal-only: pre-sorted rays through the
    # unsorted kernel, so key quality is isolated from the sort cost) ----
    lo_b = jnp.asarray(scene.bbox_lo, jnp.float32)
    span = jnp.maximum(jnp.asarray(scene.bbox_hi, jnp.float32) - lo_b, 1e-6)

    def key_variant(org_, dirn_, variant):
        q = jnp.clip((org_ - lo_b) / span, 0.0, 1.0)
        if variant == 'oct_morton15':          # current production key
            return ppt._ray_sort_key(org_, dirn_, scene.bbox_lo,
                                     scene.bbox_hi)
        if variant == 'morton15_oct':          # spatial-major
            cell = (q * 31.0).astype(jnp.uint32)
            m = jnp.zeros(org_.shape[0], jnp.uint32)
            for b in range(5):
                for a_ in range(3):
                    m = m | (((cell[:, a_] >> b) & 1)
                             << jnp.uint32(3 * (b + 1) + a_ - 3 + 3))
            oc = ((dirn_[:, 0] < 0).astype(jnp.uint32)
                  | ((dirn_[:, 1] < 0).astype(jnp.uint32) << 1)
                  | ((dirn_[:, 2] < 0).astype(jnp.uint32) << 2))
            return (m << jnp.uint32(3)) | oc
        if variant == 'morton6d':              # interleave pos(4b) dir(2b)
            cell = (q * 15.0).astype(jnp.uint32)          # 4 bits/axis
            dq = jnp.clip((dirn_ * 0.5 + 0.5) * 3.999, 0, 3).astype(
                jnp.uint32)                               # 2 bits/axis
            m = jnp.zeros(org_.shape[0], jnp.uint32)
            bit = 0
            for b in range(4):                 # MSB-first interleave
                for a_ in range(3):
                    m = (m << jnp.uint32(1)) | ((cell[:, a_] >> (3 - b)) & 1)
                    bit += 1
                if b < 2:
                    for a_ in range(3):
                        m = (m << jnp.uint32(1)) | ((dq[:, a_] >> (1 - b))
                                                    & 1)
                        bit += 1
            return m
        if variant == 'oct_dir2_morton12':     # direction-heavier
            cell = (q * 15.0).astype(jnp.uint32)
            m = jnp.zeros(org_.shape[0], jnp.uint32)
            for b in range(4):
                for a_ in range(3):
                    m = m | (((cell[:, a_] >> b) & 1)
                             << jnp.uint32(3 * b + a_))
            ad = jnp.abs(dirn_)
            axis = jnp.argmax(ad, axis=-1).astype(jnp.uint32)
            oc = ((dirn_[:, 0] < 0).astype(jnp.uint32)
                  | ((dirn_[:, 1] < 0).astype(jnp.uint32) << 1)
                  | ((dirn_[:, 2] < 0).astype(jnp.uint32) << 2))
            return (((oc << jnp.uint32(2)) | axis) << jnp.uint32(12)) | m
        raise ValueError(variant)

    for variant in ('oct_morton15', 'morton15_oct', 'morton6d',
                    'oct_dir2_morton12'):
        kv = key_variant(o2, d2, variant)
        kv = kv | ((tf2 <= tn).astype(jnp.uint32) << jnp.uint32(30))
        perm = jnp.argsort(kv)
        o2s, d2s = o2[perm], d2[perm]
        tn_s, tf_s = tn[perm], tf2[perm]
        jax.block_until_ready(o2s)
        timeit("K b2-closest key=%s" % variant,
               lambda: ppt.intersect_packet(
                   nodes, tris, o2s, d2s, tn_s, tf_s, **kw), n)

    # ---- where do iterations go? (debug-count kernel build) ----
    def counts(label, o_, d_, tn_, tf_, presort=True):
        if presort:
            kv = ppt._ray_sort_key(o_, d_, scene.bbox_lo, scene.bbox_hi)
            kv = kv | ((tf_ <= tn_).astype(jnp.uint32) << jnp.uint32(30))
            perm = jnp.argsort(kv)
            o_, d_, tn_, tf_ = o_[perm], d_[perm], tn_[perm], tf_[perm]
        _, c = ppt.intersect_packet(nodes, tris, o_, d_, tn_, tf_,
                                    debug_counts=True, **kw)
        c = np.asarray(c).astype(np.float64)
        print("%-28s pops %7.0f  culled %6.0f  leafvis %6.0f  "
              "trirows %7.0f   (per packet, mean; %d packets)"
              % (label, c[:, 0].mean(), c[:, 1].mean(), c[:, 2].mean(),
                 c[:, 3].mean(), c.shape[0]))

    counts("N camera (tiled, unsorted)", org, dirn, tn, tf, presort=False)
    counts("N bounce-1 (sorted)", o1, d1, tn, tf1)
    counts("N bounce-2 (sorted)", o2, d2, tn, tf2)

    # ---- leaf sweep on the incoherent phases ----
    for leaf in args.leaf_sweep:
        s2 = sb.commit(leaf_size=leaf)
        n2, t2 = s2.packet['nodes'], s2.packet['tris']
        kw2 = dict(max_leaf=s2.leaf_size, hbm=s2.packet_hbm,
                   use_cull=s2.any_cull)
        skw2 = dict(bbox_lo=s2.bbox_lo, bbox_hi=s2.bbox_hi, **kw2)
        print("-- leaf %d: %d nodes" % (s2.leaf_size, n2.shape[0]))
        timeit("  leaf%-3d bounce-2 closest" % s2.leaf_size,
               lambda: ppt.intersect_packet_sorted(
                   n2, t2, o2, d2, tn, tf2, **skw2), n)
        timeit("  leaf%-3d shadow@b1 any-hit" % s2.leaf_size,
               lambda: ppt.occluded_packet_sorted(
                   n2, t2, so1, sd1, stn1, stf1, **skw2), ns_rays)


if __name__ == '__main__':
    main()
