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

Two structural choices keep per-PROGRAM overhead down (measured ~7-8 us
per grid program when each ray block was its own program — window-DMA
issue latency, not compute):
* all eight per-ray scalars ship as ONE packed (R, 8) array (one input
  DMA per program instead of eight), and
* each program processes `kb` consecutive 64-ray blocks (fori-swept
  ranges per block), amortizing the program prologue ~kb-fold.

Used standalone for small scenes and as the inner sweep of the binned
incoherent-ray paths (treelet: pallas_traverse.intersect_dense_binned;
uniform grid: ops/grid.py), where each 64-ray block sweeps only its
cell's contiguous tri-tile range [gs, ge).  Reference behavior matched:
rtcIntersect/rtcOccluded exactness (devices/device_singleray/api/
scene_flat.h:90-108) including back-face culling filters
(trianglemesh_normals.cpp:68-104).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, BARY_EPS

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
    gt = (t + TL - 1) // TL
    # assemble rows in place (slice writes) — a transpose+concatenate
    # chain here made 3 extra full-table copies, and fresh-page faults
    # on this host cost far more than the arithmetic
    rows = np.zeros((gt * TL, 16), np.float32)
    wv = np.asarray(woop, np.float32).reshape(4, t, 3)
    for i in range(4):
        rows[:t, 3 * i:3 * i + 3] = wv[i]
    rows[:t, 12:15] = geom_host['ng']
    rows[:t, 15] = geom_host['cull']
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
    ok = (live & (uh >= -BARY_EPS) & (vh >= -BARY_EPS) & (uh + vh <= 1.0 + BARY_EPS)
          & (th > tn) & (th < tf))
    if use_cull:
        ngd = dx * p[12] + dy * p[13] + dz * p[14]
        ok = ok & ((p[15] != 1.0) | (ngd < 0.0))
    return ok, th


def _ray_slices(rays_ref, j, rt):
    """Per-ray-tile (RB,1) column slices of block j from the packed
    (kb*rt*RB, 8) window."""
    out = []
    for k in range(rt):
        r0 = (j * rt + k) * RB
        sl = rays_ref[r0:r0 + RB, :]
        out.append([sl[:, c:c + 1] for c in range(8)])
    return out


def _kernel(planes_ref, rays_ref, t_out, tri_out,
            rt: int, kb: int, use_cull: bool,
            gs_ref=None, ge_ref=None):
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, TL), 1)
    pid = pl.program_id(0)
    for j in range(kb):
        b = pid * kb + j
        g0 = jnp.int32(0) if gs_ref is None else gs_ref[b]
        g1 = (jnp.int32(planes_ref.shape[0]) if ge_ref is None
              else ge_ref[b])
        rays = _ray_slices(rays_ref, j, rt)

        def body(g, carry, rays=rays):
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
            tm = jnp.min(tb, axis=1, keepdims=True)          # (RB, 1)
            # first lane achieving the min (deterministic tie-break)
            hitl = tb <= tm
            lsel = jnp.min(jnp.where(hitl, lane, TL), axis=1,
                           keepdims=True)
            at = lane == lsel
            tri = jnp.max(jnp.where(at, ib, -1), axis=1, keepdims=True)
            r0 = (j * rt + k) * RB
            t_out[r0:r0 + RB, :] = tm
            tri_out[r0:r0 + RB, :] = jnp.where(tm < INF, tri, -1)


def _kernel_any(planes_ref, rays_ref, occ_out,
                rt: int, kb: int, use_cull: bool,
                gs_ref=None, ge_ref=None):
    pid = pl.program_id(0)
    for j in range(kb):
        b = pid * kb + j
        g0 = jnp.int32(0) if gs_ref is None else gs_ref[b]
        g1 = (jnp.int32(planes_ref.shape[0]) if ge_ref is None
              else ge_ref[b])
        rays = _ray_slices(rays_ref, j, rt)

        def cond(state):
            g = state[0]
            alldone = jnp.bool_(True)
            for k in range(rt):
                alldone = alldone & jnp.all(state[1 + k] != 0)
            return (g < g1) & ~alldone

        def body(state, rays=rays):
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

        # dead rays (tfar <= tnear) start occluded so they never block
        # the early exit, and are masked back to False on output (the
        # occluded_packet contract — pallas_traverse.py _kernel_any)
        deads = []
        init = [g0]
        for k in range(rt):
            _, _, _, _, _, _, tn, tf = rays[k]
            deads.append((tf <= tn).astype(jnp.int32)[:, :1])
            init.append(deads[-1])
        state = jax.lax.while_loop(cond, body, tuple(init))
        for k in range(rt):
            r0 = (j * rt + k) * RB
            occ_out[r0:r0 + RB, :] = state[1 + k] * (1 - deads[k])


def _pack_rays(org, dirn, tnear, tfar):
    return jnp.concatenate(
        [org, dirn, tnear[:, None], tfar[:, None]], axis=1)


def _specs(pblk, n_prog_in):
    ins = [pl.BlockSpec(memory_space=pltpu.VMEM),          # planes
           pl.BlockSpec((pblk, 8), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]          # packed rays
    ins += [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_prog_in

    def ob():
        return pl.BlockSpec((pblk, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return ins, ob


@partial(jax.jit, static_argnames=('rt', 'kb', 'use_cull', 'interpret'))
def intersect_pairs_raw(planes, org, dirn, tnear, tfar,
                        gs=None, ge=None, rt: int = 8, kb: int = 8,
                        use_cull: bool = True, interpret: bool = False):
    """(t, tri) of the closest hit; u/v are NOT computed here (see
    intersect_pairs).  org/dirn (R,3); R % (8*rt*kb) == 0.  gs/ge:
    optional (R // (8*rt),) i32 per-64-ray-block tri-tile ranges
    (treelet/grid sweeps)."""
    r = org.shape[0]
    pblk = RB * rt * kb
    assert r % pblk == 0, f"ray count must be a multiple of {pblk}"
    grid = (r // pblk,)
    ranged = gs is not None
    ins, ob = _specs(pblk, 2 if ranged else 0)
    args = [planes, _pack_rays(org, dirn, tnear, tfar)]
    if ranged:
        args += [gs.astype(jnp.int32), ge.astype(jnp.int32)]

    def kernel(*refs):
        kw = {}
        if ranged:
            kw['gs_ref'], kw['ge_ref'] = refs[2], refs[3]
            outs = refs[4:]
        else:
            outs = refs[2:]
        _kernel(*refs[:2], *outs, rt=rt, kb=kb, use_cull=use_cull, **kw)

    t, tri = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=ins,
        out_specs=[ob(), ob()],
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


@partial(jax.jit, static_argnames=('rt', 'kb', 'use_cull', 'interpret'))
def intersect_pairs(planes, rows, org, dirn, tnear, tfar,
                    gs=None, ge=None, rt: int = 8, kb: int = 8,
                    use_cull: bool = True,
                    interpret: bool = False) -> Hit:
    """Dense closest-hit over [gs, ge) tri-tiles (whole scene if None).
    Exact same contract as pallas_dense.intersect_dense (INF t on miss)."""
    t, tri = intersect_pairs_raw(planes, org, dirn, tnear, tfar,
                                 gs=gs, ge=ge, rt=rt, kb=kb,
                                 use_cull=use_cull, interpret=interpret)
    u, v = recompute_uv(rows, org, dirn, t, tri)
    return Hit(t, tri, u, v)


@partial(jax.jit, static_argnames=('rt', 'kb', 'use_cull', 'interpret'))
def occluded_pairs(planes, org, dirn, tnear, tfar,
                   gs=None, ge=None, rt: int = 8, kb: int = 8,
                   use_cull: bool = True, interpret: bool = False):
    """Dense any-hit over [gs, ge) tri-tiles; early-exits once every ray
    in a 64-ray block is occluded.  Dead lanes (tfar <= tnear) report
    occluded=False (the pallas_traverse.occluded_packet contract)."""
    r = org.shape[0]
    pblk = RB * rt * kb
    assert r % pblk == 0, f"ray count must be a multiple of {pblk}"
    grid = (r // pblk,)
    ranged = gs is not None
    ins, ob = _specs(pblk, 2 if ranged else 0)
    args = [planes, _pack_rays(org, dirn, tnear, tfar)]
    if ranged:
        args += [gs.astype(jnp.int32), ge.astype(jnp.int32)]

    def kernel(*refs):
        kw = {}
        if ranged:
            kw['gs_ref'], kw['ge_ref'] = refs[2], refs[3]
            outs = refs[4:]
        else:
            outs = refs[2:]
        _kernel_any(*refs[:2], *outs, rt=rt, kb=kb, use_cull=use_cull,
                    **kw)

    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=ins,
        out_specs=ob(),
        out_shape=jax.ShapeDtypeStruct((r, 1), jnp.int32),
        interpret=interpret,
    )(*args)
    return occ[:, 0] != 0
