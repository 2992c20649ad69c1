"""On-chip A/B of BVH build-quality variants (the measurement half of the
SBVH work: diag_sbvh.py predicts packet-union rows offline; this script
times the COMPILED packet kernels on the real device).

For each tree variant it reports, per scene:
  * bounce-1 closest-hit Mrps (presorted rays through intersect_packet,
    K-amortized in-jit, input-varied, fetch-synced — the honest-timing
    rules of README "Measurement correction")
  * shadow@b1 any-hit Mrps (same rules, occluded_packet)
  * debug-count profile [pops, culled, leaf visits, tri rows] per packet
  * full render_frame Mrps (depth 4, spp 4 — sort + shading included)

Variants wrap the native builder's quality knobs by monkey-patching
build_native_sbvh defaults before commit, so the product path (scene
.commit) is exercised end-to-end, SMEM node caps and all.

Usage: python scripts/bench_tree_ab.py [--res 1024] [--scene colonnade]
       [--skip-render]
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
    ap.add_argument('--skip-render', action='store_true')
    ap.add_argument('--variants', type=str, default='')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.geometry import bvh as gb
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    VARIANTS = [
        # label, commit quality, sbvh kwarg overrides
        ('obj', 'normal', {}),
        ('align (r4 default)', 'high',
         dict(spatial=False, align_rows=True)),
        ('sp+al', 'high-spatial', {}),
        ('al+ct0.5', 'high', dict(spatial=False, align_rows=True,
                                  c_trav=0.5)),
        ('sp+al+ct0.25', 'high', dict(spatial=True, align_rows=True,
                                      c_trav=0.25)),
        ('sp+al+ct1.0', 'high', dict(spatial=True, align_rows=True,
                                     c_trav=1.0)),
    ]
    if args.variants:
        keep = args.variants.split(',')
        VARIANTS = [v for v in VARIANTS if any(k in v[0] for k in keep)]

    sb = getattr(builtin_scenes, args.scene)()
    camera = getattr(builtin_scenes, args.scene + '_camera')(
        args.res, args.res)

    orig_sbvh = gb.build_native_sbvh

    def commit_variant(quality, over):
        if over:
            gb.build_native_sbvh = (
                lambda *a, **kw: orig_sbvh(*a, **{**kw, **over}))
        try:
            return sb.commit(leaf_size=args.leaf, quality=quality)
        finally:
            gb.build_native_sbvh = orig_sbvh

    # ---- ray populations (built ONCE off the default tree, replayed
    # over every variant so between-variant ratios are apples-to-apples)
    scene0 = commit_variant('high', {})
    w = h = args.res
    n = w * h
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    kw0 = dict(max_leaf=scene0.leaf_size, hbm=scene0.packet_hbm,
               use_cull=scene0.any_cull)
    hit = ppt.intersect_packet(scene0.packet['nodes'],
                               scene0.packet['tris'],
                               org, dirn, tn, tf, **kw0)
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(scene0.geom, org, dirn, hit)
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
    # presort ONCE (hit-point order, the production wavefront's order) —
    # key uses the scene bbox, which is tree-independent
    perm = ppt.hitpoint_sort_perm(o1, scene0.bbox_lo, scene0.bbox_hi,
                                  live=tf1 > 0)
    o1s, d1s = o1[perm], d1[perm]
    tn1s, tf1s = tn[perm], tf1[perm]

    # shadow rays from bounce-0 hits toward one sampled light direction
    lights = [l for l in scene0.lights if l['kind'] == 'triangle']
    if lights:
        l = lights[0]
        u2l = grng.uniform2(jnp.uint32(11), jnp.asarray(order),
                            jnp.zeros((n,), jnp.uint32), jnp.uint32(40))
        su = jnp.sqrt(u2l[:, :1])
        lp = (l['v0'] * (1 - su) + l['v1'] * (su * (1 - u2l[:, 1:]))
              + l['v2'] * (su * u2l[:, 1:]))
        dvec = lp - p0
        dist = jnp.linalg.norm(dvec, axis=-1)
        sd = dvec / jnp.maximum(dist, 1e-6)[:, None]
        stn = jnp.full((n,), 1e-3)
        stf = jnp.where(valid, dist - 1e-3, -1.0)
    else:
        sd, stn, stf = d1, tn, tf1
    sperm = ppt.hitpoint_sort_perm(p0, scene0.bbox_lo, scene0.bbox_hi,
                                   live=stf > 0)
    sos, sds = p0[sperm], sd[sperm]
    stns, stfs = stn[sperm], stf[sperm]

    K = 8

    def amortized(fn, n_rays, label):
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
        mrps = n_rays / dt / 1e6
        print("  %-26s %8.1f ms  %8.2f Mrps" % (label, dt * 1e3, mrps),
              flush=True)
        return mrps

    for label, quality, over in VARIANTS:
        t0 = time.perf_counter()
        scene = commit_variant(quality, over)
        dt_c = time.perf_counter() - t0
        nodes = scene.packet['nodes']
        tris = scene.packet['tris']
        kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                  use_cull=scene.any_cull)
        print("%s: %d nodes, leaf %d, %d tri rows, hbm=%s (commit %.1fs)"
              % (label, nodes.shape[0], scene.leaf_size, tris.shape[0],
                 scene.packet_hbm, dt_c), flush=True)

        amortized(lambda e, _n=nodes, _t=tris, _k=kw:
                  ppt.intersect_packet(_n, _t, o1s, d1s, tn1s + e, tf1s,
                                       **_k).t,
                  n, "bounce-1 closest (sorted)")
        amortized(lambda e, _n=nodes, _t=tris, _k=kw:
                  ppt.occluded_packet(_n, _t, sos, sds, stns + e, stfs,
                                      **_k).astype(jnp.float32),
                  n, "shadow@b0 any-hit (sorted)")
        _, c = ppt.intersect_packet(nodes, tris, o1s, d1s, tn1s, tf1s,
                                    debug_counts=True, **kw)
        c = np.asarray(c).astype(np.float64)
        print("  counts/packet: pops %.0f culled %.0f leafvis %.0f "
              "trirows %.0f" % (c[:, 0].mean(), c[:, 1].mean(),
                                c[:, 2].mean(), c[:, 3].mean()),
              flush=True)
        if not args.skip_render:
            params = pt.PTParams(max_depth=4)
            _r.render_frame(scene, camera, params, w, h, spp=4, seed=0)
            _, stats = _r.render_frame(scene, camera, params, w, h,
                                       spp=4, seed=1)
            print("  %-26s %8.1f ms  %8.2f Mrps"
                  % ("full render d4 spp4", stats.seconds * 1e3,
                     stats.mrps), flush=True)


if __name__ == '__main__':
    main()
