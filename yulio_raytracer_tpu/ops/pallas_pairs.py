"""Outer-product dense intersector: rays in sublanes, triangles in lanes.

The original dense kernel (pallas_dense.py) keeps 1024 rays in the lane
dimension and broadcasts each triangle's 16 constants out of a packed
(128,) row — 128 lane-extract+broadcast shuffles per 8-triangle row.
Measured on v5e that caps it at ~15-20 Gpairs/s (~12% VPU utilization);
the shuffles, not the arithmetic, dominate.

This kernel flips the orientation (the TPU analog of the ISPC device's
structure-of-arrays triangle tests, devices/device_ispc/shapes/*.isph):

* a (8, 128) VPU tile holds 8 RAYS (sublanes) x 128 TRIANGLES (lanes);
* triangle constants live in a transposed "planes" layout (Gt, 16, 128)
  — plane j of tri-tile g is a natural (1, 128) contiguous load;
* per-ray values are (8, 1) slices broadcast along lanes (cheap);
* every op in the inner loop is a full-width multiply/add/select — no
  shuffles at all.

Per (ray, tri) pair this costs ~50 lane-ops -> ~75 Gpairs/s speed of
light on one v5e core; measured ~4-6x the row-packed kernel.

Used standalone for small scenes and as the inner sweep of the
treelet-binned incoherent-ray path (pallas_traverse.intersect_binned_*),
where each 64-ray program sweeps only its treelet's contiguous tri-tile
range [gs, ge) — replacing shared-stack traversal whose per-packet leaf
UNION made incoherent packets ~35x wasteful (see PARITY.md round-2
notes).  Reference behavior matched: rtcIntersect/rtcOccluded exactness
(devices/device_singleray/api/scene_flat.h:90-108) including back-face
culling filters (trianglemesh_normals.cpp:68-104).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

RB = 8            # rays per tile (sublane dim)
TL = 128          # tris per tile (lane dim)
INF = float(np.inf)


def pack_planes(woop: np.ndarray, geom_host: dict):
    """Transposed triangle constants for the outer-product kernel.

    Returns (planes, rows):
      planes: (Gt, 16, 128) f32 — tri-tile g, plane j, lane l = constant
              j of triangle g*128+l.  Plane order matches pack_tris'
              16-float layout: [woop.T (12) | ng (3) | cull].
      rows:   (Tpad, 16) f32 row-major copy for the XLA-side u/v
              recompute gather (intersect_pairs returns t/tri from the
              kernel; u/v are rebuilt outside from the winning row).
    Padding triangles are all-zero: d'_z == 0 never passes the hit test.
    """
    t = woop.shape[1] // 3
    w = np.asarray(woop, np.float32).reshape(4, t, 3)
    w = np.transpose(w, (1, 0, 2)).reshape(t, 12)
    flat = np.concatenate([
        w, np.asarray(geom_host['ng'], np.float32),
        np.asarray(geom_host['cull'], np.float32)[:, None]], axis=1)
    gt = (t + TL - 1) // TL
    rows = np.zeros((gt * TL, 16), np.float32)
    rows[:t] = flat
    planes = np.ascontiguousarray(
        rows.reshape(gt, TL, 16).transpose(0, 2, 1))
    return planes, rows


def _pair_tile(p, ox, oy, oz, dx, dy, dz, tn, tf, use_cull: bool):
    """Test an (RB,1) ray tile against a (16,128) plane tile.
    Returns (ok, th): (RB, TL) hit mask and distances."""
    oup = ox * p[0] + oy * p[3] + oz * p[6] + p[9]
    ovp = ox * p[1] + oy * p[4] + oz * p[7] + p[10]
    owp = ox * p[2] + oy * p[5] + oz * p[8] + p[11]
    dup = dx * p[0] + dy * p[3] + dz * p[6]
    dvp = dx * p[1] + dy * p[4] + dz * p[7]
    dwp = dx * p[2] + dy * p[5] + dz * p[8]
    live = jnp.abs(dwp) > 1e-12
    inv_dw = 1.0 / jnp.where(live, dwp, 1.0)
    th = -owp * inv_dw
    uh = oup + th * dup
    vh = ovp + th * dvp
    ok = (live & (uh >= 0.0) & (vh >= 0.0) & (uh + vh <= 1.0)
          & (th > tn) & (th < tf))
    if use_cull:
        ngd = dx * p[12] + dy * p[13] + dz * p[14]
        ok = ok & ((p[15] != 1.0) | (ngd < 0.0))
    return ok, th


def _load_rays(refs, k):
    """(RB,1) slices of ray-tile k from the (RBLK,1) program block."""
    return [r[RB * k:RB * (k + 1), :] for r in refs]


def _kernel(planes_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tn_ref, tf_ref, t_out, tri_out,
            rt: int, use_cull: bool, gs_ref=None, ge_ref=None):
    rays = [_load_rays(
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tn_ref, tf_ref),
        k) for k in range(rt)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, TL), 1)
    pid = pl.program_id(0)
    g0 = jnp.int32(0) if gs_ref is None else gs_ref[pid]
    g1 = (jnp.int32(planes_ref.shape[0]) if ge_ref is None
          else ge_ref[pid])

    def body(g, carry):
        p = planes_ref[g]
        out = []
        idx = g * TL + lane
        for k in range(rt):
            tb, ib = carry[2 * k], carry[2 * k + 1]
            ox, oy, oz, dx, dy, dz, tn, tf = rays[k]
            ok, th = _pair_tile(p, ox, oy, oz, dx, dy, dz,
                                tn, jnp.minimum(tf, tb), use_cull)
            out.append(jnp.where(ok, th, tb))
            out.append(jnp.where(ok, idx, ib))
        return tuple(out)

    init = []
    for _ in range(rt):
        init.append(jnp.full((RB, TL), INF))
        init.append(jnp.full((RB, TL), -1, jnp.int32))
    carry = jax.lax.fori_loop(g0, g1, body, tuple(init))

    for k in range(rt):
        tb, ib = carry[2 * k], carry[2 * k + 1]
        tm = jnp.min(tb, axis=1, keepdims=True)            # (RB, 1)
        # first lane achieving the min (deterministic tie-break)
        hitl = tb <= tm
        lsel = jnp.min(jnp.where(hitl, lane, TL), axis=1, keepdims=True)
        at = lane == lsel
        tri = jnp.max(jnp.where(at, ib, -1), axis=1, keepdims=True)
        t_out[RB * k:RB * (k + 1), :] = tm
        tri_out[RB * k:RB * (k + 1), :] = jnp.where(
            tm < INF, tri, -1)


def _kernel_any(planes_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                dz_ref, tn_ref, tf_ref, occ_out,
                rt: int, use_cull: bool, gs_ref=None, ge_ref=None):
    rays = [_load_rays(
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tn_ref, tf_ref),
        k) for k in range(rt)]
    pid = pl.program_id(0)
    g0 = jnp.int32(0) if gs_ref is None else gs_ref[pid]
    g1 = (jnp.int32(planes_ref.shape[0]) if ge_ref is None
          else ge_ref[pid])

    def cond(state):
        g = state[0]
        # stop when every ray of every tile is occluded (early exit)
        alldone = jnp.bool_(True)
        for k in range(rt):
            alldone = alldone & jnp.all(state[1 + k] != 0)
        return (g < g1) & ~alldone

    def body(state):
        g = state[0]
        p = planes_ref[g]
        out = [g + 1]
        for k in range(rt):
            occ = state[1 + k]
            ox, oy, oz, dx, dy, dz, tn, tf = rays[k]
            ok, _ = _pair_tile(p, ox, oy, oz, dx, dy, dz, tn, tf,
                               use_cull)
            out.append(occ | jnp.any(ok, axis=1, keepdims=True)
                       .astype(jnp.int32))
        return tuple(out)

    # dead rays (tfar <= tnear) start occluded so they never block the
    # early exit (mirrors _kernel_any in pallas_traverse.py)
    init = [g0]
    for k in range(rt):
        _, _, _, _, _, _, tn, tf = rays[k]
        init.append((tf <= tn).astype(jnp.int32)[:, :1])
    state = jax.lax.while_loop(cond, body, tuple(init))
    for k in range(rt):
        occ_out[RB * k:RB * (k + 1), :] = state[1 + k]


def _specs(rblk, n_prog_in):
    def rb():
        return pl.BlockSpec((rblk, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ins = [pl.BlockSpec(memory_space=pltpu.VMEM)]     # planes (whole)
    ins += [rb()] * 8
    ins += [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_prog_in
    return ins, rb


@partial(jax.jit, static_argnames=('rt', 'use_cull', 'interpret'))
def intersect_pairs_raw(planes, org, dirn, tnear, tfar,
                        gs=None, ge=None, rt: int = 4,
                        use_cull: bool = True, interpret: bool = False):
    """(t, tri) of the closest hit; u/v are NOT computed here (see
    intersect_pairs).  org/dirn (R,3); R % (8*rt) == 0.  gs/ge: optional
    (R // (8*rt),) i32 per-program tri-tile ranges (treelet sweep)."""
    r = org.shape[0]
    rblk = RB * rt
    assert r % rblk == 0, f"ray count must be a multiple of {rblk}"
    grid = (r // rblk,)
    ranged = gs is not None
    ins, rb = _specs(rblk, 2 if ranged else 0)
    args = [planes,
            org[:, 0:1], org[:, 1:2], org[:, 2:3],
            dirn[:, 0:1], dirn[:, 1:2], dirn[:, 2:3],
            tnear[:, None], tfar[:, None]]
    if ranged:
        args += [gs.astype(jnp.int32), ge.astype(jnp.int32)]

    def kernel(*refs):
        kw = {}
        if ranged:
            kw['gs_ref'], kw['ge_ref'] = refs[9], refs[10]
            outs = refs[11:]
        else:
            outs = refs[9:]
        _kernel(*refs[:9], *outs, rt=rt, use_cull=use_cull, **kw)

    t, tri = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=ins,
        out_specs=[rb(), rb()],
        out_shape=[jax.ShapeDtypeStruct((r, 1), jnp.float32),
                   jax.ShapeDtypeStruct((r, 1), jnp.int32)],
        interpret=interpret,
    )(*args)
    return t[:, 0], tri[:, 0]


def recompute_uv(rows, org, dirn, t, tri):
    """Rebuild barycentric u/v for the winning triangle outside the
    kernel (one (R,16) gather + ~20 flops/ray beats carrying two extra
    (8,128) accumulators through the sweep)."""
    s = rows[jnp.maximum(tri, 0)]
    ok = tri >= 0
    oup = (org[:, 0] * s[:, 0] + org[:, 1] * s[:, 3]
           + org[:, 2] * s[:, 6] + s[:, 9])
    ovp = (org[:, 0] * s[:, 1] + org[:, 1] * s[:, 4]
           + org[:, 2] * s[:, 7] + s[:, 10])
    dup = (dirn[:, 0] * s[:, 0] + dirn[:, 1] * s[:, 3]
           + dirn[:, 2] * s[:, 6])
    dvp = (dirn[:, 0] * s[:, 1] + dirn[:, 1] * s[:, 4]
           + dirn[:, 2] * s[:, 7])
    u = oup + t * dup
    v = ovp + t * dvp
    return jnp.where(ok, u, 0.0), jnp.where(ok, v, 0.0)


@partial(jax.jit, static_argnames=('rt', 'use_cull', 'interpret'))
def intersect_pairs(planes, rows, org, dirn, tnear, tfar,
                    gs=None, ge=None, rt: int = 4,
                    use_cull: bool = True, interpret: bool = False) -> Hit:
    """Dense closest-hit over [gs, ge) tri-tiles (whole scene if None).
    Exact same contract as pallas_dense.intersect_dense (INF t on miss)."""
    t, tri = intersect_pairs_raw(planes, org, dirn, tnear, tfar,
                                 gs=gs, ge=ge, rt=rt, use_cull=use_cull,
                                 interpret=interpret)
    u, v = recompute_uv(rows, org, dirn, t, tri)
    return Hit(t, tri, u, v)


@partial(jax.jit, static_argnames=('rt', 'use_cull', 'interpret'))
def occluded_pairs(planes, org, dirn, tnear, tfar,
                   gs=None, ge=None, rt: int = 8,
                   use_cull: bool = True, interpret: bool = False):
    """Dense any-hit over [gs, ge) tri-tiles; early-exits once every ray
    in the program block is occluded.  Dead lanes (tfar <= tnear) report
    occluded=True like pallas_traverse.occluded_packet."""
    r = org.shape[0]
    rblk = RB * rt
    assert r % rblk == 0, f"ray count must be a multiple of {rblk}"
    grid = (r // rblk,)
    ranged = gs is not None
    ins, rb = _specs(rblk, 2 if ranged else 0)
    args = [planes,
            org[:, 0:1], org[:, 1:2], org[:, 2:3],
            dirn[:, 0:1], dirn[:, 1:2], dirn[:, 2:3],
            tnear[:, None], tfar[:, None]]
    if ranged:
        args += [gs.astype(jnp.int32), ge.astype(jnp.int32)]

    def kernel(*refs):
        kw = {}
        if ranged:
            kw['gs_ref'], kw['ge_ref'] = refs[9], refs[10]
            outs = refs[11:]
        else:
            outs = refs[9:]
        _kernel_any(*refs[:9], *outs, rt=rt, use_cull=use_cull, **kw)

    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=ins,
        out_specs=rb(),
        out_shape=jax.ShapeDtypeStruct((r, 1), jnp.int32),
        interpret=interpret,
    )(*args)
    return occ[:, 0] != 0
