"""Intra-bounce stage shares at the production config (round 5).

VERDICT r4 next #2: "publish traversal / NEE-shadow / argsort /
shade+texture wall shares at the production config".  The per-bounce
table (scripts/profile_bounces.py) showed bounces 1-3 at full width eat
~60% of the depth-10 wall with 79-97% live lanes — compaction cannot
shrink them; the lever is INSIDE the full-width bounce.  This script
splits one full-width production bounce into its stages.

Method: replicate trace_compacted's host loop (one _bounce_step
dispatch per bounce + _compact_step between) and CAPTURE the wavefront
state entering bounces 1..3 — real scattered origins/directions, real
live masks.  Each stage is then timed as its own jitted dispatch on the
captured states, fetch-synced (jax.block_until_ready is a no-op on the
tunneled axon backend — README "Measurement correction").  The three
bounce states give input variation across repeats (execution-dedup-
proof).  Isolated stage sums can differ from the whole-bounce anchor
(XLA fusion across stage boundaries) — both are reported.

Stages:
  whole        anchor: the production _bounce_step (presorted) dispatch
  regroup      _ray_sort_key + argsort + state gather (what
               _compact_step pays; also what unsorted callers pay inside
               _sorted_call)
  closest      closest-hit packet traversal on presorted rays
  post+shade   post_intersect + shade_context (texture fetches, bump)
  nee_sample   per-light sample + BRDF eval + contribution (elementwise)
  hitsort      hitpoint_sort_perm + tile_perm (the shared shadow argsort)
  shadow       the nl*R any-hit shadow traversal (perm reused)
  scatter      sample_lobes + throughput/state update (elementwise)
  compact      _compact_step at full width (sort + L flush + gathers)

Usage: python scripts/profile_stage_shares.py [--scene sponza_like]
           [--res 1024] [--depth 10] [--bounces 1 2 3] [--stereo]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', type=str, default='sponza_like')
    ap.add_argument('--res', type=int, default=1024)
    ap.add_argument('--depth', type=int, default=10)
    ap.add_argument('--bounces', type=int, nargs='*', default=[1, 2, 3])
    ap.add_argument('--stereo', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.utils import compile_cache
    compile_cache.enable("/root/.cache/jax_comp")
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.shading import lobes as lb
    from yulio_raytracer_tpu.shading import materials as gmat
    from yulio_raytracer_tpu.lights import lights as glights
    from yulio_raytracer_tpu.sampling import patterns
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = getattr(builtin_scenes, args.scene)().commit(leaf_size=32)
    w = h = args.res
    if args.stereo:
        from yulio_raytracer_tpu.cameras import cameras as cam
        l2w = cam.look_at((-9.0, 2.2, 0.0), (10.0, 1.6, 0.0),
                          (0.0, 1.0, 0.0))
        camera = cam.make_stereo_rig(l2w, scene_scale=0.05)[1]
        params = pt.PTParams(max_depth=args.depth, t_max_shadow_ray=120.0)
    else:
        camera = getattr(builtin_scenes, args.scene + '_camera')(w, h)
        params = pt.PTParams(max_depth=args.depth)
    nl = len(scene.lights)
    print("scene: %d tris, %d lights, res %d, depth %d" % (
        scene.num_triangles, nl, args.res, args.depth), flush=True)

    # ---- capture wavefront states entering bounces 1..max(bounces) ----
    r = w * h
    order = _r._tile_order(w, h)
    pixel_ids = jnp.asarray(order)
    sample0 = jnp.zeros((r,), jnp.uint32)
    seed = np.uint32(0)
    spp_grid = patterns.grid_scalars(1)
    org, dirn, uv, tm, _ = _r._raygen_jit(scene, camera, w, h, spp_grid,
                                          pixel_ids, sample0, seed)
    state = pt._init_state(org, dirn, pixel_ids, sample0, uv, tm)
    state['rid'] = jnp.arange(r, dtype=jnp.int32)
    jseed = jnp.uint32(0)
    state, n_live = pt._bounce_step(scene, params, state, jnp.int32(0),
                                    jseed, sort_rays=False)
    states = {}
    for d in range(1, max(args.bounces) + 1):
        n = int(jax.device_get(n_live))
        l_dummy = jnp.zeros((r, 3))
        state, _ = pt._compact_step(state, l_dummy, scene.bbox_lo,
                                    scene.bbox_hi, r,
                                    params.min_contribution)
        states[d] = {k: v for k, v in state.items()}
        print("  captured state entering bounce %d  (live %d / %d = "
              "%.1f%%)" % (d, n, r, 100.0 * n / r), flush=True)
        state, n_live = pt._bounce_step(scene, params, state,
                                        jnp.int32(d), jseed,
                                        sort_rays=True, presorted=True)

    # ---- stage functions (each its own jit) ----
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
              use_cull=scene.any_cull)
    nodes, tris = scene.packet['nodes'], scene.packet['tris']
    minc = params.min_contribution
    up = jnp.asarray(params.up, jnp.float32)
    has_cap = np.isfinite(params.t_max_shadow_ray)

    @jax.jit
    def f_regroup(st):
        key = ppt._ray_sort_key(st['org'], st['dir'],
                                jnp.asarray(scene.bbox_lo),
                                jnp.asarray(scene.bbox_hi))
        live = st['active'] & (jnp.max(st['throughput'], axis=-1) >= minc)
        key = key | ((~live).astype(jnp.uint32) << jnp.uint32(30))
        perm = jnp.argsort(key)
        return st['org'][perm], st['dir'][perm]

    @jax.jit
    def f_closest(st):
        live = st['active'] & (jnp.max(st['throughput'], axis=-1) >= minc)
        tfar = jnp.where(live, jnp.inf, -1.0)
        return ppt.intersect_packet(nodes, tris, st['org'], st['dir'],
                                    jnp.zeros((r,)), tfar, **kw)

    @jax.jit
    def f_postshade(st, hit):
        dg = ops_i.post_intersect(scene.geom, st['org'], st['dir'], hit)
        backfacing = jnp.sum(dg['Ng'] * st['dir'], -1) > 0.0
        ns = jnp.where(backfacing[:, None], -dg['Ns'], dg['Ns'])
        lobed, aux = gmat.shade_context(scene.materials, scene.textures,
                                        dg['mat_id'], dg['st'],
                                        st['medium_eta'],
                                        st['medium_trans'],
                                        ns=ns, tx=dg.get('Tx'),
                                        ty=dg.get('Ty'))
        return dg, lobed, aux, ns

    def nee_batch(st, dg, lobed, ns, hit):
        """Per-light sample+eval (the elementwise NEE block)."""
        wo = -st['dir']
        live = st['active'] & (jnp.max(st['throughput'], axis=-1) >= minc)
        use_dl = lb.has_type(lobed, lb.DIFFUSE) & live & hit.valid
        err_eps = dg['error'] * params.epsilon
        cands, wis, tfars = [], [], []
        for li, l in enumerate(scene.lights):
            u2 = jnp.stack([jnp.full((r,), 0.3), jnp.full((r,), 0.7)], -1)
            le, wi, pdf, tmax = glights.sample(l, dg['P'], ns, u2)
            cand = use_dl & (pdf > 0.0) & jnp.any(le > 0.0, axis=-1)
            brdf = lb.eval_lobes(lobed, ns, dg['Ng'], wo, wi, lb.DIFFUSE)
            cand = cand & jnp.any(brdf > 0.0, axis=-1)
            if has_cap:
                t_cap = params.t_max_shadow_ray
                dot_up = jnp.sum(wi * up, -1)
                tmax = t_cap + jnp.where(
                    dot_up <= 0.0, t_cap * 100.0 * jnp.abs(dot_up), 0.0)
            cands.append(cand)
            wis.append(wi)
            tfars.append(jnp.where(cand, tmax - err_eps, -1.0))
        return (jnp.stack(cands), jnp.stack(wis), jnp.stack(tfars),
                err_eps)

    f_nee_sample = jax.jit(nee_batch)

    @jax.jit
    def f_hitsort(dg, hit):
        p0 = ppt.hitpoint_sort_perm(dg['P'], scene.bbox_lo, scene.bbox_hi,
                                    live=hit.tri >= 0)
        return ppt.tile_perm(p0, nl, r)

    @jax.jit
    def f_shadow(dg, wi_all, tfar_all, err_eps, perm):
        return ppt.occluded_packet_sorted(
            nodes, tris, jnp.tile(dg['P'], (nl, 1)),
            wi_all.reshape(nl * r, 3), jnp.tile(err_eps, (nl,)),
            tfar_all.reshape(nl * r), scene.bbox_lo, scene.bbox_hi,
            perm=perm, **kw)

    @jax.jit
    def f_scatter(st, dg, lobed, ns):
        wo = -st['dir']
        s2 = jnp.stack([jnp.full((r,), 0.4), jnp.full((r,), 0.6)], -1)
        s1 = jnp.full((r,), 0.5)
        samp = lb.sample_lobes(lobed, ns, dg['Ng'], wo, s2, s1, lb.ALL,
                               tx=dg.get('Tx'), ty=dg.get('Ty'),
                               types_present=getattr(scene, 'lobe_types',
                                                     None))
        w_ = samp['weight'] / jnp.maximum(samp['pdf'], 1e-20)[:, None]
        return st['throughput'] * w_, samp['wi']

    def f_whole(st, d):
        return pt._bounce_step(scene, params, st, jnp.int32(d), jseed,
                               sort_rays=True, presorted=True)

    import dataclasses

    def f_whole_noshadow(st, d):
        p2 = dataclasses.replace(params, _skip=('shadow',))
        return pt._bounce_step(scene, p2, st, jnp.int32(d), jseed,
                               sort_rays=True, presorted=True)

    def f_whole_nonee(st, d):
        p2 = dataclasses.replace(params, _skip=('nee',))
        return pt._bounce_step(scene, p2, st, jnp.int32(d), jseed,
                               sort_rays=True, presorted=True)

    def f_compact(st):
        return pt._compact_step(st, jnp.zeros((r, 3)), scene.bbox_lo,
                                scene.bbox_hi, r, minc)

    def sync(x):
        leaves = jax.tree.leaves(x)
        np.asarray(jax.device_get(leaves[0].ravel()[:1]))

    def timeit(fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out)
        return time.perf_counter() - t0, out

    # ---- run: per bounce, a warm input set compiles/warms every stage,
    # then a NUDGED input set (same shapes, different values — backend
    # execution dedup cannot replay the warm answer) is timed ----
    def stage_set(st, d):
        hit = f_closest(st)
        dg, lobed, aux, ns = f_postshade(st, hit)
        cand_all, wi_all, tfar_all, err_eps = f_nee_sample(
            st, dg, lobed, ns, hit)
        perm = f_hitsort(dg, hit)
        sync(perm)
        stages = [
            ('whole', lambda: timeit(f_whole, st, d)),
            ('whole-shadow', lambda: timeit(f_whole_noshadow, st, d)),
            ('whole-nee', lambda: timeit(f_whole_nonee, st, d)),
            ('regroup', lambda: timeit(f_regroup, st)),
            ('closest', lambda: timeit(f_closest, st)),
            ('post+shade', lambda: timeit(f_postshade, st, hit)),
            ('nee_sample', lambda: timeit(f_nee_sample, st, dg, lobed,
                                          ns, hit)),
            ('hitsort', lambda: timeit(f_hitsort, dg, hit)),
            ('shadow', lambda: timeit(f_shadow, dg, wi_all, tfar_all,
                                      err_eps, perm)),
            ('scatter', lambda: timeit(f_scatter, st, dg, lobed, ns)),
            ('compact', lambda: timeit(f_compact, st)),
        ]
        return stages

    rows = {}
    for d in args.bounces:
        st_warm = states[d]
        st_time = dict(st_warm)
        st_time['org'] = st_warm['org'] * (1.0 + 1e-7)
        for name, fn in stage_set(st_warm, d):     # compile + warm
            t, _ = fn()
            if d == args.bounces[0]:
                print("  [compile+warm] %-12s %7.2f s" % (name, t),
                      flush=True)
        for name, fn in stage_set(st_time, d):     # timed
            t, _ = fn()
            rows.setdefault(name, {})[d] = t

    # ---- report ----
    whole = rows['whole']
    print("\nstage shares per full-width bounce (r = %d rays, %d lights)"
          % (r, nl), flush=True)
    hdr = "  %-12s" + "  b%-2d ms   shr " * len(args.bounces)
    print(hdr % tuple(['stage'] + args.bounces), flush=True)
    for name in [s for s in rows]:
        cells = []
        for d in args.bounces:
            t = rows[name].get(d)
            cells += [t * 1e3, 100.0 * t / whole[d]]
        fmt = "  %-12s" + "  %7.1f %5.1f%%" * len(args.bounces)
        print(fmt % tuple([name] + cells), flush=True)
    iso = [n for n in rows if n not in ('whole', 'whole-shadow',
                                        'whole-nee', 'compact')]
    for d in args.bounces:
        s = sum(rows[n][d] for n in iso)
        print("  isolated-sum b%d: %.1f ms vs whole %.1f ms (fusion "
              "delta %+.0f%%)" % (d, s * 1e3, whole[d] * 1e3,
                                  100.0 * (s - whole[d]) / whole[d]),
              flush=True)


if __name__ == '__main__':
    main()
