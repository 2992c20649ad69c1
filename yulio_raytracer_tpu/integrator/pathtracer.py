"""Wavefront path-trace integrator.

The reference's recursive-turned-iterative per-pixel loop
(`integrators/pathtraceintegrator.cpp:50-217`) becomes a `lax.scan` over
bounce index with the whole ray batch as state: every semantic branch of
the C++ loop is reproduced as a masked tensor op, cited inline.

Divergences from the reference (deliberate, documented):
* RNG: decorrelated pcg4d streams per (pixel, sample, bounce, purpose)
  instead of precomputed shared sample sets; the reference reuses one 2D
  light sample across bounces and reuses the Russian-roulette float as the
  lobe-selection float (pathtraceintegrator.cpp:179,189) — both are
  variance/bias quirks we do not copy.
* Russian roulette divides surviving throughput by q (the reference omits
  the 1/q compensation, which darkens deep paths).
* tMaxShadowRay == inf disables the shadow-cap/jitter/horizon machinery
  entirely (the reference's inf default produces inf-inf = NaN tMax in
  C++, effectively disabling shadows — clearly unintended; finite values
  reproduce the Yulio dome-lighting trick exactly).  NOTE the faithful
  finite-cap semantics REPLACE every light sample's tMax — a shadow ray
  toward an area/quad light overshoots the light and reports occlusion
  by whatever lies behind it (pathtraceintegrator.cpp:152 does the
  same), so finite caps only make sense for dome/ambient-lit scenes —
  exactly the Yulio production configuration (YulioRT.h:41).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as vm
from ..core import rng
from ..ops import intersect as ops_i
from ..ops import traverse as ops_t
from ..shading import lobes as lb
from ..shading import materials as gmat
from ..lights import lights as glights

ULP = float(np.finfo(np.float32).eps / 2)  # 2^-24; C++ `ulp` = 2^-23?
# the reference uses `float(ulp)` = machine epsilon of float = 1.19e-7
ULP = 1.1920929e-7


@dataclass(frozen=True)
class PTParams:
    """Defaults match pathtraceintegrator.cpp:24-32."""
    max_depth: int = 10
    rr_depth: int = 5
    min_contribution: float = 0.02
    epsilon: float = 32.0 * ULP
    t_max_shadow_ray: float = float('inf')
    t_max_shadow_jitter: float = 0.15
    up: tuple = (0.0, 1.0, 0.0)
    strict_normals: bool = True
    # when set, the geometry's triangle axis is sharded over this mesh axis
    # and hits are combined across it (parallel/sharding.py)
    tri_axis: Optional[str] = None
    # bounce>=1 wavefront regrouping: 'morton' = octant/Morton sort,
    # 'grid' = uniform-grid DDA + cell-binned dense sweeps (ops/grid.py
    # — exact near-to-far termination for incoherent rays), 'dense' =
    # treelet-binned dense sweeps (ablation; overlapping treelet boxes
    # keep its fallback expensive), 'treelet' = treelet-binned
    # stack-kernel rounds (ablation), 'none' = raw pixel order.
    # NOTE commit(accel='bvh4') wide kernels serve only 'morton' and
    # unsorted bounces; the ablation binnings use their own tables.
    ray_binning: str = 'morton'
    # backplate: optional (H, W, 3) image for unbent escaped rays
    # (pathtraceintegrator.cpp:80-84); None disables


# RNG dimension layout (per bounce `d`, base = 16 + stride*d).
# With <= 5 lights the historical layout (stride 16, lights at dim 8)
# is preserved bit-for-bit (golden images pin it); more lights widen the
# layout so shadow-jitter dims never collide with light-sample dims and
# bounces never overlap (collision at nl >= 6 under the fixed layout).
_DIM_SCATTER = 0        # 2D lobe directional sample
_DIM_SCATTER_TYPE = 1   # 1D lobe selection
_DIM_RR = 2             # 1D russian roulette
_DIM_SHADOW = 3         # 1D shadow tMax jitter (+light)
_DIM_LIGHT = 8          # 2D light sample (+light)


def _dim_layout(n_lights: int):
    """(dim_light, stride) for n_lights (static per scene)."""
    if n_lights <= 5:
        return _DIM_LIGHT, 16
    dim_light = _DIM_SHADOW + n_lights
    return dim_light, dim_light + n_lights


def _bounce_dims(depth, stride: int = 16):
    return jnp.uint32(stride) + jnp.uint32(stride) * depth.astype(jnp.uint32)


def _use_packet(scene, org):
    """Pallas kernels need TPU (tests exercise interpret mode directly)
    and BLOCK-aligned ray counts."""
    from ..ops import pallas_traverse as ppt
    return (scene.packet is not None
            and org.shape[0] % ppt.BLOCK == 0
            and jax.default_backend() == 'tpu')


def _intersect(scene, org, dirn, tnear, tfar, time=None,
               sort_rays=False, binning='treelet'):
    if 'mv0' in scene.geom and time is not None:
        # motion blur (sphere_motion / -accel bvh4mb scenes): packet
        # traversal over union-bounds BVH when committed, dense otherwise
        if _use_packet(scene, org) and 'tris_mb' in scene.packet:
            from ..ops import pallas_traverse as ppt
            return ppt.intersect_packet_mb(
                scene.packet['nodes'], scene.packet['tris_mb'], org, dirn,
                tnear, tfar, time, max_leaf=scene.leaf_size)
        return ops_i.intersect_brute(scene.geom, org, dirn, tnear, tfar,
                                     time=time)
    if _use_packet(scene, org):
        from ..ops import pallas_traverse as ppt
        from ..ops import pallas_dense as ppd
        if 'nodes' not in scene.packet:
            return ppd.intersect_dense(scene.packet['tris'], org, dirn,
                                       tnear, tfar)
        if (sort_rays and binning == 'grid'
                and 'grid' in scene.packet):
            from ..ops import grid as ggrid
            from ..scene import GRID_RES
            return ggrid.intersect_grid(
                scene.packet['grid'], scene.packet['nodes'],
                scene.packet['tris'], org, dirn, tnear, tfar,
                scene.bbox_lo, scene.bbox_hi, res=GRID_RES,
                max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                use_cull=scene.any_cull)
        if (sort_rays and binning == 'dense'
                and 'planes' in scene.packet):
            return ppt.intersect_dense_binned(
                scene.packet['nodes'], scene.packet['tris'],
                scene.packet['planes'], scene.packet['planes_rows'],
                scene.packet['treelet_boxes'],
                scene.packet['treelet_tile_lo'],
                scene.packet['treelet_tile_hi'], org, dirn,
                tnear, tfar, scene.bbox_lo, scene.bbox_hi,
                max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                use_cull=scene.any_cull)
        if (sort_rays and binning == 'treelet'
                and 'treelet_roots' in scene.packet):
            return ppt.intersect_packet_binned(
                scene.packet['nodes'], scene.packet['tris'],
                scene.packet['treelet_roots'],
                scene.packet['treelet_boxes'], org, dirn,
                tnear, tfar, scene.bbox_lo, scene.bbox_hi,
                max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                use_cull=scene.any_cull)
        if sort_rays and binning != 'none':
            if 'nodes4' in scene.packet:
                from ..ops import pallas_wide as ppw
                return ppw.intersect_packet4_sorted(
                    scene.packet['nodes4'], scene.packet['tris'], org,
                    dirn, tnear, tfar, scene.bbox_lo, scene.bbox_hi,
                    max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                    use_cull=scene.any_cull)
            return ppt.intersect_packet_sorted(
                scene.packet['nodes'], scene.packet['tris'], org, dirn,
                tnear, tfar, scene.bbox_lo, scene.bbox_hi,
                max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                use_cull=scene.any_cull)
        if 'nodes4' in scene.packet:
            from ..ops import pallas_wide as ppw
            return ppw.intersect_packet4(
                scene.packet['nodes4'], scene.packet['tris'], org, dirn,
                tnear, tfar, max_leaf=scene.leaf_size,
                hbm=scene.packet_hbm, use_cull=scene.any_cull)
        return ppt.intersect_packet(
            scene.packet['nodes'], scene.packet['tris'], org, dirn,
            tnear, tfar, max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
            use_cull=scene.any_cull)
    if scene.bvh is not None:
        return ops_t.intersect_bvh(scene.geom, scene.bvh, org, dirn,
                                   tnear, tfar, leaf_size=scene.leaf_size)
    if 'woop' in scene.geom:
        return ops_i.intersect_woop(scene.geom, org, dirn, tnear, tfar)
    return ops_i.intersect_brute(scene.geom, org, dirn, tnear, tfar)


def _post_intersect_combined(scene, org, dirn, hit, tri_axis):
    """post_intersect, combining per-shard closest hits across a sharded
    triangle axis: all shards end up with the globally-nearest hit's full
    shading record, so everything downstream of intersection is replicated
    compute (the cross-shard min is the only collective per bounce)."""
    dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
    if tri_axis is None:
        return hit, dg
    t_all = jax.lax.all_gather(hit.t, tri_axis)          # (S, R)
    winner = jnp.argmin(t_all, axis=0)                   # (R,)

    def pick(x):
        x_all = jax.lax.all_gather(x, tri_axis)
        idx = winner.reshape((1,) + winner.shape + (1,) * (x.ndim - 1))
        return jnp.take_along_axis(
            x_all, idx.astype(jnp.int32), axis=0)[0]

    hit = ops_i.Hit(pick(hit.t), pick(hit.tri), pick(hit.u), pick(hit.v))
    dg = {k: pick(v) for k, v in dg.items()}
    return hit, dg


def _occluded(scene, org, dirn, tnear, tfar, tri_axis=None, time=None,
              sort_rays=False, binning='treelet', seg=None, perm=None):
    if 'mv0' in scene.geom and time is not None:
        if _use_packet(scene, org) and 'tris_mb' in scene.packet:
            from ..ops import pallas_traverse as ppt
            occ = ppt.occluded_packet_mb(
                scene.packet['nodes'], scene.packet['tris_mb'], org, dirn,
                tnear, tfar, time, max_leaf=scene.leaf_size)
        else:
            occ = ops_i.occluded_brute(scene.geom, org, dirn, tnear, tfar,
                                       time=time)
    elif _use_packet(scene, org):
        from ..ops import pallas_traverse as ppt
        from ..ops import pallas_dense as ppd
        if 'nodes' not in scene.packet:
            occ = ppd.occluded_dense(scene.packet['tris'], org, dirn,
                                     tnear, tfar)
        elif (sort_rays and binning == 'grid'
                and 'grid' in scene.packet):
            from ..ops import grid as ggrid
            from ..scene import GRID_RES
            occ = ggrid.occluded_grid(
                scene.packet['grid'], scene.packet['nodes'],
                scene.packet['tris'], org, dirn, tnear, tfar,
                scene.bbox_lo, scene.bbox_hi, res=GRID_RES,
                max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                use_cull=scene.any_cull)
        elif (sort_rays and binning == 'dense'
                and 'planes' in scene.packet):
            occ = ppt.occluded_dense_binned(
                scene.packet['nodes'], scene.packet['tris'],
                scene.packet['planes'], scene.packet['treelet_boxes'],
                scene.packet['treelet_tile_lo'],
                scene.packet['treelet_tile_hi'], org, dirn,
                tnear, tfar, scene.bbox_lo, scene.bbox_hi,
                max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                use_cull=scene.any_cull)
        elif (sort_rays and binning == 'treelet'
                and 'treelet_roots' in scene.packet):
            occ = ppt.occluded_packet_binned(
                scene.packet['nodes'], scene.packet['tris'],
                scene.packet['treelet_roots'],
                scene.packet['treelet_boxes'], org, dirn,
                tnear, tfar, scene.bbox_lo, scene.bbox_hi,
                max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                use_cull=scene.any_cull)
        elif sort_rays and binning != 'none':
            if 'nodes4' in scene.packet:
                from ..ops import pallas_wide as ppw
                occ = ppw.occluded_packet4_sorted(
                    scene.packet['nodes4'], scene.packet['tris'], org,
                    dirn, tnear, tfar, scene.bbox_lo, scene.bbox_hi,
                    max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                    use_cull=scene.any_cull, seg=seg, perm=perm)
            else:
                occ = ppt.occluded_packet_sorted(
                    scene.packet['nodes'], scene.packet['tris'], org,
                    dirn, tnear, tfar, scene.bbox_lo, scene.bbox_hi,
                    max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
                    use_cull=scene.any_cull, seg=seg, perm=perm)
        elif 'nodes4' in scene.packet:
            from ..ops import pallas_wide as ppw
            occ = ppw.occluded_packet4(
                scene.packet['nodes4'], scene.packet['tris'], org, dirn,
                tnear, tfar, max_leaf=scene.leaf_size,
                hbm=scene.packet_hbm, use_cull=scene.any_cull)
        else:
            occ = ppt.occluded_packet(
                scene.packet['nodes'], scene.packet['tris'], org, dirn,
                tnear, tfar, max_leaf=scene.leaf_size,
                hbm=scene.packet_hbm, use_cull=scene.any_cull)
    elif scene.bvh is not None:
        occ = ops_t.occluded_bvh(scene.geom, scene.bvh, org, dirn,
                                 tnear, tfar, leaf_size=scene.leaf_size)
    elif 'woop' in scene.geom:
        occ = ops_i.occluded_woop(scene.geom, org, dirn, tnear, tfar)
    else:
        occ = ops_i.occluded_brute(scene.geom, org, dirn, tnear, tfar)
    if tri_axis is not None:
        occ = jax.lax.psum(occ.astype(jnp.int32), tri_axis) > 0
    return occ


def trace(scene, params: PTParams, org, dirn, seed, pixel_id, sample_id,
          pixel_uv=None, backplate=None, time=None, samples=None):
    """Estimate radiance along primary rays.

    org/dirn: (R, 3); pixel_id/sample_id: (R,) uint32 (RNG keys);
    pixel_uv: (R, 2) in [0,1)^2 for backplate lookups.
    samples: optional precomputed sample-set tables
    (sampling/precomputed.py — the reference's SamplerFactory sequences,
    sampler.cpp:85-160): dict with 'set'/'sidx' (R,) int32 and
    's1d' (sets, spp, >=max_depth) / 's2d' (sets, spp, >=1+max_depth, 2).
    When given, the NEE light sample is 2D dim 0 (shared by every light
    and depth, pathtraceintegrator.cpp:39+133), scatter directions are
    2D dims 1+depth (cpp:188), and the scatter-type 1D dim `depth` is
    REUSED for Russian roulette (cpp:179+189) — exactly the reference's
    stream.  Shadow tMax jitter stays stateless (the reference draws the
    global system RNG there, cpp:152 — irreproducible by design).
    Returns (L (R, 3), num_rays (scalar f32)).
    """
    r = org.shape[0]
    up = jnp.asarray(params.up, jnp.float32)
    seed = jnp.uint32(seed)
    has_shadow_cap = np.isfinite(params.t_max_shadow_ray)

    env_lights = scene.env_lights
    all_lights = scene.lights

    state = {
        'org': org,
        'dir': dirn,
        'L': jnp.zeros((r, 3)),
        'throughput': jnp.ones((r, 3)),
        'active': jnp.ones((r,), bool),
        'ignore_vl': jnp.zeros((r,), bool),
        'unbent': jnp.ones((r,), bool),
        'medium_eta': jnp.ones((r,)),
        'medium_trans': jnp.ones((r, 3)),
        'eta_rr': jnp.ones((r,)),
        'num_rays': jnp.zeros((), jnp.float32),
    }

    dim_light, dim_stride = _dim_layout(len(all_lights))

    # NEE light groups: same-kind lights are sampled through ONE vmapped
    # graph instance (stacked parameter arrays), so trace/compile size
    # stays O(#kinds) instead of O(#lights) — a Collada export with
    # dozens of lights compiles as fast as the 3-light cornell.  HDRI
    # lights group only when their maps share a shape (static w/h).
    def _group_key(l):
        if l['kind'] == 'hdri':
            return ('hdri', l['width'], l['height'])
        return (l['kind'],)

    light_groups = {}
    for _li, _l in enumerate(all_lights):
        light_groups.setdefault(_group_key(_l), []).append(_li)
    _NO_STACK = ('kind', 'width', 'height')

    def _stacked(idxs):
        arrs = {}
        proto = all_lights[idxs[0]]
        for key, val in proto.items():
            if key in _NO_STACK or isinstance(val, str):
                arrs[key] = val
            elif isinstance(val, dict):
                arrs[key] = {k2: jnp.stack(
                    [jnp.asarray(all_lights[i][key][k2]) for i in idxs])
                    for k2 in val}
            elif key.endswith('mask'):
                arrs[key] = jnp.asarray(np.asarray(
                    [all_lights[i][key] for i in idxs],
                    np.int64).astype(np.uint32))
            else:
                arrs[key] = jnp.stack(
                    [jnp.asarray(all_lights[i][key]) for i in idxs])
        return arrs

    def bounce(state, depth, sort_rays=False):
        base = _bounce_dims(depth, dim_stride)
        if samples is not None:
            _sset, _sidx = samples['set'], samples['sidx']
            # shared NEE light sample: 2D dim 0 (cpp:39,133)
            nee_u2 = samples['s2d'][_sset, _sidx, 0]
            # per-depth scatter-type 1D, reused by RR (cpp:179,189)
            pre_s1 = samples['s1d'][_sset, _sidx, depth]
            pre_s2 = samples['s2d'][_sset, _sidx, 1 + depth]
        active = state['active']
        org = state['org']
        dirn = state['dir']
        thr = state['throughput']
        L = state['L']

        # terminate low-contribution paths (pathtraceintegrator.cpp:66-67)
        active = active & (jnp.max(thr, axis=-1) >= params.min_contribution)

        # dead lanes get tfar < tnear: they fail every slab/tri test, so
        # they never widen the packet frustum, and the ray sort banishes
        # them to all-dead packets that terminate in O(1) (the wavefront
        # analog of the reference simply not recursing, cpp:169-182)
        tfar_live = jnp.where(active, jnp.inf, -1.0)
        hit = _intersect(scene, org, dirn,
                         jnp.zeros((r,)), tfar_live,
                         time=time, sort_rays=sort_rays,
                         binning=params.ray_binning)
        state = dict(state)
        state['num_rays'] = state['num_rays'] + jnp.sum(active)
        hit, dg = _post_intersect_combined(scene, org, dirn, hit,
                                           params.tri_axis)
        wo = -dirn

        # ---- miss: backplate or environment lights (cpp:79-92) ----
        miss = active & ~hit.valid
        env_l = jnp.zeros((r, 3))
        if backplate is not None and pixel_uv is not None:
            bp_h, bp_w = backplate.shape[0], backplate.shape[1]
            bx = jnp.clip((pixel_uv[:, 0] * bp_w).astype(jnp.int32), 0,
                          bp_w - 1)
            by = jnp.clip((pixel_uv[:, 1] * bp_h).astype(jnp.int32), 0,
                          bp_h - 1)
            bp = backplate[by, bx]
            env_l = jnp.where(state['unbent'][:, None], bp, env_l)
            non_bp = ~state['unbent']
        else:
            non_bp = jnp.ones((r,), bool)
        env_sum = jnp.zeros((r, 3))
        for l in env_lights:
            env_sum = env_sum + glights.le_env(l, wo)
        env_l = env_l + jnp.where((non_bp & ~state['ignore_vl'])[:, None],
                                  env_sum, 0.0)
        L = L + jnp.where(miss[:, None], thr * env_l, 0.0)
        active = active & hit.valid

        # ---- face-forward normals (cpp:94-98) ----
        backfacing = vm.dot(dg['Ng'], dirn) > 0.0
        ng = jnp.where(backfacing[:, None], -dg['Ng'], dg['Ng'])
        ns = jnp.where(backfacing[:, None], -dg['Ns'], dg['Ns'])

        # ---- shade: material -> lobe context (cpp:108-111) ----
        lobed, aux = gmat.shade_context(scene.materials, scene.textures,
                                        dg['mat_id'], dg['st'],
                                        state['medium_eta'],
                                        state['medium_trans'],
                                        ns=ns, tx=dg.get('Tx'),
                                        ty=dg.get('Ty'))
        ns = aux.get('ns', ns)   # bump-mapped shading normal

        # ---- area-light emission (cpp:113-115) ----
        for li, l in enumerate(all_lights):
            if l['kind'] != 'triangle':
                continue
            is_hit_light = active & (dg['light_id'] == li) & ~backfacing \
                & ~state['ignore_vl']
            L = L + jnp.where(is_hit_light[:, None],
                              thr * glights.le_area(l, backfacing), 0.0)

        # ---- NEE: shadow rays to every light (cpp:117-167) ----
        # Sampling/shading is unrolled per light (kinds differ), but ALL
        # lights' occlusion rays are batched into ONE traversal call: one
        # kernel instance regardless of light count (compile time stays
        # flat with dozens of lights), one ray sort, and same-light rays
        # pack into coherent packets.
        use_dl = lb.has_type(lobed, lb.DIFFUSE) & active
        err_eps = dg['error'] * params.epsilon
        # group-major stacked NEE tensors: cand/contrib/wi/tfar (nk, R..)
        cand_gs, contrib_gs, wi_gs, tfar_gs = [], [], [], []

        def nee_one(l, li_dim, illum_mask_u32):
            """One light's NEE sample+shade (vmapped per kind group;
            li_dim carries the ORIGINAL light index so RNG streams are
            identical to the unrolled form)."""
            mask_ok = (illum_mask_u32
                       & dg['illum_mask'].astype(jnp.uint32)) != 0
            u2 = (nee_u2 if samples is not None else
                  rng.uniform2(seed, pixel_id, sample_id,
                               base + jnp.uint32(dim_light) + li_dim))
            le, wi, pdf, tmax = glights.sample(l, dg['P'], ns, u2)
            cand = use_dl & mask_ok & (pdf > 0.0) \
                & jnp.any(le > 0.0, axis=-1)
            brdf = lb.eval_lobes(lobed, ns, ng, wo, wi, lb.DIFFUSE)
            cand = cand & jnp.any(brdf > 0.0, axis=-1)

            if has_shadow_cap:
                # Yulio dome trick (cpp:148-157): cap shadow length with
                # jitter; lengthen up to 100x below the horizon
                jit = rng.uniform1(
                    seed, pixel_id, sample_id,
                    base + jnp.uint32(_DIM_SHADOW) + li_dim)
                t_cap = params.t_max_shadow_ray
                t_jit = params.t_max_shadow_jitter
                jlen = 2.0 * t_cap * t_jit * jit - t_cap * t_jit
                tmax = t_cap + jlen
                dot_up = vm.dot(wi, up)
                below = dot_up <= 0.0
                tmax = tmax + jnp.where(
                    below,
                    t_cap * 100.0 * vm.smoothstep(0.0, 1.0,
                                                  jnp.abs(dot_up)),
                    0.0)

            contrib = thr * le * brdf / jnp.maximum(pdf, 1e-20)[:, None]
            return cand, contrib, wi, jnp.where(cand, tmax - err_eps,
                                                -1.0)

        for gkey, idxs in light_groups.items():
            if gkey[0] == 'hdri':
                # HDRI's Distribution2D holds ragged CDF tables that do
                # not batch; sample each directly (rarely more than one)
                for li in idxs:
                    c1, k1, w1, t1 = nee_one(
                        all_lights[li], jnp.uint32(li),
                        jnp.uint32(all_lights[li]['illum_mask']
                                   & 0xFFFFFFFF))
                    cand_gs.append(c1[None])
                    contrib_gs.append(k1[None])
                    wi_gs.append(w1[None])
                    tfar_gs.append(t1[None])
                continue
            stacked = _stacked(idxs)
            statics = {k: v for k, v in stacked.items()
                       if k in _NO_STACK or isinstance(v, str)}
            arrays = {k: v for k, v in stacked.items()
                      if k not in statics and k != 'illum_mask'}
            dims = jnp.asarray(idxs, jnp.uint32)
            masks = stacked['illum_mask']
            c_g, k_g, w_g, t_g = jax.vmap(
                lambda larr, d, m, _s=statics: nee_one(
                    {**_s, **larr}, d, m),
                in_axes=(0, 0, 0))(arrays, dims, masks)
            cand_gs.append(c_g)
            contrib_gs.append(k_g)
            wi_gs.append(w_g)
            tfar_gs.append(t_g)

        if cand_gs:
            cand_all = jnp.concatenate(cand_gs)        # (nl, R)
            contrib_all = jnp.concatenate(contrib_gs)  # (nl, R, 3)
            wi_all = jnp.concatenate(wi_gs)            # (nl, R, 3)
            tfar_all = jnp.concatenate(tfar_gs)        # (nl, R)
            nl = cand_all.shape[0]
            state['num_rays'] = state['num_rays'] + jnp.sum(cand_all)
            # every light's shadow batch starts at the SAME hit points:
            # one origin-Morton argsort shared light-major across the
            # whole nl*r batch (an nl*r argsort costs ~40-50 ms/Mray on
            # v5e — the single largest wavefront-binning cost)
            shadow_perm = None
            # only the morton binning branch of _occluded consumes perm;
            # grid/dense/treelet/none would pay the argsort for nothing
            if sort_rays and nl > 0 and params.ray_binning == 'morton':
                from ..ops import pallas_traverse as _ppt
                p0 = _ppt.hitpoint_sort_perm(
                    dg['P'], scene.bbox_lo, scene.bbox_hi,
                    live=hit.tri >= 0)
                shadow_perm = _ppt.tile_perm(p0, nl, r)
            occ_all = _occluded(
                scene,
                jnp.tile(dg['P'], (nl, 1)),
                wi_all.reshape(nl * r, 3),
                jnp.tile(err_eps, (nl,)),
                tfar_all.reshape(nl * r),
                params.tri_axis, time=(None if time is None
                                       else jnp.tile(time, (nl,))),
                sort_rays=sort_rays, binning=params.ray_binning,
                perm=shadow_perm)
            lit = cand_all & ~occ_all.reshape(nl, r)
            L = L + jnp.sum(jnp.where(lit[:, :, None], contrib_all, 0.0),
                            axis=0)

        # ---- depth cut (cpp:169-170) ----
        cont = active & (depth < params.max_depth - 1)

        # ---- russian roulette (cpp:172-182, with 1/q compensation) ----
        q = jnp.minimum(jnp.max(thr, axis=-1) * state['eta_rr'] ** 2, 0.95)
        rr_on = depth >= (params.rr_depth - 1)
        rr_u = (pre_s1 if samples is not None else
                rng.uniform1(seed, pixel_id, sample_id,
                             base + jnp.uint32(_DIM_RR)))
        killed = rr_on & (rr_u >= q)
        cont = cont & ~killed
        rr_scale = jnp.where(rr_on, 1.0 / jnp.maximum(q, 1e-3), 1.0)

        # ---- GI: sample one lobe (cpp:184-213) ----
        if samples is not None:
            s2, s1 = pre_s2, pre_s1    # s1 == rr_u, as in the reference
        else:
            s2 = rng.uniform2(seed, pixel_id, sample_id,
                              base + jnp.uint32(_DIM_SCATTER))
            s1 = rng.uniform1(seed, pixel_id, sample_id,
                              base + jnp.uint32(_DIM_SCATTER_TYPE))
        samp = lb.sample_lobes(lobed, ns, ng, wo, s2, s1, lb.ALL,
                               tx=dg.get('Tx'), ty=dg.get('Ty'),
                               types_present=getattr(scene, 'lobe_types',
                                                     None))
        cont = cont & samp['valid'] & (samp['pdf'] > 0.0) \
            & jnp.any(samp['weight'] > 0.0, axis=-1)

        # simple volumetrics: Beer attenuation through the current medium
        # (cpp:197-201): c *= transmission^tfar when medium is absorbing
        trans_med = state['medium_trans']
        absorbing = jnp.any(trans_med < 1.0, axis=-1)
        beer = jnp.where(absorbing[:, None],
                         jnp.power(jnp.maximum(trans_med, 1e-20),
                                   hit.t[:, None]), 1.0)

        w = samp['weight'] * beer / jnp.maximum(samp['pdf'], 1e-20)[:, None]
        new_thr = thr * w * rr_scale[:, None]

        # medium transition on sampled transmission (cpp:203-206)
        trans_bit = (samp['type_bits'] & jnp.uint32(lb.TRANSMISSION_BITS)) != 0
        new_eta_m, new_trans_m = gmat.next_medium(
            aux, trans_bit, state['medium_eta'], state['medium_trans'])

        # offset new ray origin (cpp:210: Ray(dg.P, dir, err*eps, inf))
        new_org = dg['P']
        new_dir = samp['wi']
        # emulate tnear via a small push along the direction (our intersect
        # uses tnear=0 for the next segment); the error-scaled epsilon is
        # the reference's self-intersection guard
        new_org = new_org + new_dir * err_eps[:, None]

        # diffuse-sampled -> ignore directly visible lights next bounce
        new_ignore = (samp['type_bits'] & jnp.uint32(lb.DIFFUSE)) != 0

        state['org'] = jnp.where(cont[:, None], new_org, state['org'])
        state['dir'] = jnp.where(cont[:, None], new_dir, state['dir'])
        state['throughput'] = jnp.where(cont[:, None], new_thr, thr)
        state['L'] = L
        state['active'] = cont
        state['ignore_vl'] = jnp.where(cont, new_ignore,
                                       state['ignore_vl'])
        state['unbent'] = state['unbent'] & jnp.all(
            jnp.abs(state['dir'] - dirn) < 1e-12, axis=-1)
        state['medium_eta'] = jnp.where(cont, new_eta_m,
                                        state['medium_eta'])
        state['medium_trans'] = jnp.where(cont[:, None], new_trans_m,
                                          state['medium_trans'])
        state['eta_rr'] = jnp.where(cont, state['eta_rr'] * samp['eta'],
                                    state['eta_rr'])
        return state, None

    # bounce 0 is peeled out of the scan: primary (and first-shadow) rays
    # arrive in tiled order and need no ray binning; the remaining bounces
    # have scattered directions/origins, so their traversals run behind an
    # octant/Morton sort (pallas_traverse._ray_sort_key)
    state, _ = bounce(state, jnp.int32(0), sort_rays=False)
    if params.max_depth > 1:
        state, _ = jax.lax.scan(
            lambda st, d: bounce(st, d, sort_rays=True), state,
            jnp.arange(1, params.max_depth, dtype=jnp.int32))
    return state['L'], state['num_rays']
