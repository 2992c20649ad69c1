"""Uniform-grid DDA traversal with binned dense sweeps — incoherent rays.

The round-2 profiling campaign established two hard facts on v5e:
1. pair tests run at ~20-25 Gpairs/s on the VPU in any orientation
   (scripts/bench_pairs.py), and
2. 1024-ray shared-stack packets of bounce>=1 rays test ~35x more
   triangles than any single ray needs (leaf-union waste), while
   BVH-treelet binning cannot terminate rays early because treelet boxes
   overlap — every ray keeps candidates, so the bounded fallback pays the
   full traversal again (scripts/bench_binned_dense.py).

A uniform grid fixes the termination problem structurally: cells do NOT
overlap, so a ray marching its cells near-to-far (3D-DDA, Amanatides &
Woo) may stop at the first round whose cell-entry distance exceeds its
running best hit — any nearer triangle would overlap an already-swept
cell.  Feasibility on the 92k-tri colonnade (scripts/feasibility_grid.py):
8^3 cells give 1.22x triangle duplication, 8.7 MB of VMEM-resident
planes, and bounce-1 rays pierce a mean of 5.9 cells to their hit.

Per round, live rays are grouped by cell id (argsort + scatter — the
same wavefront-binning machinery as the treelet path) and each 64-ray
program DENSELY sweeps its cell's contiguous 128-padded triangle tiles
with the outer-product pairs kernel (ops/pallas_pairs.py).  A bounded
stack-kernel fallback finishes the straggler tail after K rounds, so
results are exact up to f32 tfar-boundary rounding (scripts/
diag_shadow.py).

The reference needed none of this: Embree's single-ray CPU traversal is
order-insensitive (devices/device_singleray/api/scene_flat.h:90-108).
On TPU the wavefront IS the machine shape, and the grid turns divergent
traversal into the two things the hardware does well: sorts and dense
sweeps.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .intersect import Hit
from . import pallas_pairs as ppp
from . import pallas_traverse as ppt

INF = float(np.inf)


def build_grid(host: dict, res: int = 8):
    """Voxelize triangles into a res^3 uniform grid (host side).

    host: BVH-permuted SoA geometry (v0/e1/e2/ng/cull/valid + woop).
    Returns a dict of device arrays:
      planes (Gt, 16, 128), rows (Tp, 16): per-cell-contiguous duplicated
        triangle constants in pallas_pairs layout (cells padded to whole
        128-triangle tiles; padding is inert);
      tri_orig (Tp,) i32: planes index -> original triangle index
        (shading tables are in original/BVH-permuted order);
      cell_tile_lo/hi (C,) i32: tri-tile range per cell;
      grid_lo/grid_hi (3,) f32, plus static res.
    AABB voxelization: a triangle lands in every cell its bounding box
    touches — conservative (extra tests are harmless, tested exact)."""
    v0 = np.asarray(host['v0'], np.float64)
    e1 = np.asarray(host['e1'], np.float64)
    e2 = np.asarray(host['e2'], np.float64)
    valid = np.asarray(host['valid'], bool)
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    glo = lo[valid].min(axis=0)
    ghi = hi[valid].max(axis=0)
    span = np.maximum(ghi - glo, 1e-6)
    # pad the box a hair so boundary points index inside
    glo = glo - span * 1e-4
    ghi = ghi + span * 1e-4
    cell = (ghi - glo) / res

    ilo = np.clip(((lo - glo) / cell).astype(np.int64), 0, res - 1)
    ihi = np.clip(((hi - glo) / cell).astype(np.int64), 0, res - 1)
    nt = v0.shape[0]
    single = valid & (ilo == ihi).all(axis=1)
    multi = valid & ~single
    tids = [np.nonzero(single)[0]]
    cids = [((ilo[single, 0] * res + ilo[single, 1]) * res
             + ilo[single, 2])]
    for t in np.nonzero(multi)[0]:       # ~10-20% of tris (dup ~1.2x)
        xs = np.arange(ilo[t, 0], ihi[t, 0] + 1)
        ys = np.arange(ilo[t, 1], ihi[t, 1] + 1)
        zs = np.arange(ilo[t, 2], ihi[t, 2] + 1)
        cc = ((xs[:, None, None] * res + ys[None, :, None]) * res
              + zs[None, None, :]).reshape(-1)
        cids.append(cc)
        tids.append(np.full(cc.shape, t, np.int64))
    cids = np.concatenate(cids)
    tids = np.concatenate(tids)
    order = np.argsort(cids, kind='stable')
    cids, tids = cids[order], tids[order]

    ncell = res ** 3
    counts = np.bincount(cids, minlength=ncell)
    pad = (counts + ppp.TL - 1) // ppp.TL * ppp.TL
    offs = np.concatenate([[0], np.cumsum(pad)])
    tp = int(offs[-1])

    # per-entry destination slot
    starts = np.concatenate([[0], np.cumsum(counts)])
    rank = np.arange(len(cids)) - starts[cids]
    slot = offs[cids] + rank

    # dense per-duplicate geometry -> planes layout
    woop = np.asarray(host['woop'], np.float32)
    t_total = woop.shape[1] // 3
    w = woop.reshape(4, t_total, 3).transpose(1, 0, 2).reshape(t_total, 12)
    flat = np.concatenate([
        w, np.asarray(host['ng'], np.float32),
        np.asarray(host['cull'], np.float32)[:, None]], axis=1)
    rows = np.zeros((tp, 16), np.float32)
    rows[slot] = flat[tids]
    tri_orig = np.full((tp,), -1, np.int32)
    tri_orig[slot] = tids.astype(np.int32)
    gt = tp // ppp.TL
    planes = np.ascontiguousarray(
        rows.reshape(gt, ppp.TL, 16).transpose(0, 2, 1))

    return {
        'planes': jnp.asarray(planes),
        'rows': jnp.asarray(rows),
        'tri_orig': jnp.asarray(tri_orig),
        'cell_tile_lo': jnp.asarray((offs[:-1] // ppp.TL)
                                    .astype(np.int32)),
        'cell_tile_hi': jnp.asarray((offs[1:] // ppp.TL)
                                    .astype(np.int32)),
        'grid_lo': jnp.asarray(glo.astype(np.float32)),
        'grid_hi': jnp.asarray(ghi.astype(np.float32)),
    }


def _dda_init(grid_lo, grid_hi, res, org, dirn, tnear):
    """Vectorized Amanatides-Woo setup.  Returns (ci (R,3) i32 cell
    index, tnext (R,3) next-boundary t per axis, tdelta (R,3), step
    (R,3) i32, t0 (R,), inside (R,))."""
    safe = jnp.where(jnp.abs(dirn) > 1e-30, dirn,
                     jnp.where(dirn >= 0, 1e-30, -1e-30))
    inv = 1.0 / safe
    t0a = (grid_lo - org) * inv
    t1a = (grid_hi - org) * inv
    tmin = jnp.max(jnp.minimum(t0a, t1a), axis=-1)
    tmax = jnp.min(jnp.maximum(t0a, t1a), axis=-1)
    t0 = jnp.maximum(tmin, tnear)
    inside = t0 <= tmax
    cellsz = (grid_hi - grid_lo) / res
    pos = org + dirn * (t0[:, None] + 1e-6)
    ci = jnp.clip(((pos - grid_lo) / cellsz).astype(jnp.int32), 0,
                  res - 1)
    step = jnp.where(dirn >= 0, 1, -1).astype(jnp.int32)
    nxt = grid_lo + (ci + (step > 0)).astype(jnp.float32) * cellsz
    tnext = (nxt - org) * inv
    tnext = jnp.where(jnp.abs(dirn) > 1e-30, tnext, INF)
    tdelta = jnp.where(jnp.abs(dirn) > 1e-30,
                       jnp.abs(cellsz * inv), INF)
    return ci, tnext, tdelta, step, t0, inside


def _dda_step(ci, tnext, tdelta, step, res):
    """Advance one cell.  Returns (ci', tnext', entry_t, inside')."""
    a = jnp.argmin(tnext, axis=-1)
    entry = jnp.min(tnext, axis=-1)
    onehot = jax.nn.one_hot(a, 3, dtype=jnp.int32)
    ci2 = ci + onehot * step
    tnext2 = tnext + onehot.astype(tnext.dtype) * tdelta
    inside = jnp.all((ci2 >= 0) & (ci2 < res), axis=-1)
    return ci2, tnext2, entry, inside


def _cell_id(ci, res):
    return ((ci[:, 0] * res + ci[:, 1]) * res + ci[:, 2]).astype(jnp.int32)


def _sweep(grid, cid, act, org, dirn, tnear, tfar, res, rt, use_cull,
           interpret):
    """Group rays by cell id and dense-sweep each cell's tiles.
    Returns (t (R,), planes_idx (R,)) for this round (INF/-1 inactive)."""
    r = org.shape[0]
    block = ppp.RB * rt
    ncell = res ** 3
    cap = r + ncell * block
    cap = (cap + block * 8 - 1) // (block * 8) * (block * 8)
    slot, org_p, dirn_p, tn_p, tf_p, seg_offs = ppt._binned_layout(
        cid, act, org, dirn, tnear, jnp.where(act, tfar, -1.0), ncell,
        (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), block=block, align=block * 8)
    gs, ge = ppt._dense_ranges(seg_offs, grid['cell_tile_lo'],
                               grid['cell_tile_hi'], cap, block)
    t_p, tri_p = ppp.intersect_pairs_raw(
        grid['planes'], org_p, dirn_p, tn_p, tf_p, gs=gs, ge=ge, rt=rt,
        use_cull=use_cull, interpret=interpret)
    take = jnp.minimum(slot, cap - 1)
    return (jnp.where(slot < cap, t_p[take], INF),
            jnp.where(slot < cap, tri_p[take], -1))


def _sweep_occ(grid, cid, act, org, dirn, tnear, tfar, res, rt,
               use_cull, interpret):
    r = org.shape[0]
    block = ppp.RB * rt
    ncell = res ** 3
    cap = r + ncell * block
    cap = (cap + block * 8 - 1) // (block * 8) * (block * 8)
    slot, org_p, dirn_p, tn_p, tf_p, seg_offs = ppt._binned_layout(
        cid, act, org, dirn, tnear, jnp.where(act, tfar, -1.0), ncell,
        (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), block=block, align=block * 8)
    gs, ge = ppt._dense_ranges(seg_offs, grid['cell_tile_lo'],
                               grid['cell_tile_hi'], cap, block)
    o = ppp.occluded_pairs(grid['planes'], org_p, dirn_p, tn_p, tf_p,
                           gs=gs, ge=ge, rt=rt, use_cull=use_cull,
                           interpret=interpret)
    take = jnp.minimum(slot, cap - 1)
    return jnp.where(slot < cap, o[take], False)


@partial(jax.jit, static_argnames=('res', 'rounds', 'rt', 'use_cull',
                                   'interpret', 'bbox_lo', 'bbox_hi',
                                   'max_leaf', 'hbm'))
def intersect_grid(grid, nodes, tris, org, dirn, tnear, tfar,
                   bbox_lo, bbox_hi, res: int = 8, rounds: int = 8,
                   rt: int = 8, max_leaf: int = 64, hbm: bool = False,
                   use_cull: bool = True, interpret: bool = False) -> Hit:
    """Exact closest-hit: DDA rounds of cell-binned dense sweeps, then a
    bounded stack-kernel fallback for rays still marching after `rounds`
    cells.  nodes/tris feed the fallback (ops/pallas_traverse.py)."""
    r = org.shape[0]
    ci, tnext, tdelta, step, t0, inside = _dda_init(
        grid['grid_lo'], grid['grid_hi'], res, org, dirn, tnear)
    live = inside & (tfar > tnear) & (t0 <= tfar)
    entry = t0
    best_t = jnp.full((r,), INF)
    best_i = jnp.full((r,), -1, jnp.int32)   # planes index

    for _ in range(rounds):
        act = live & (entry <= jnp.minimum(tfar, best_t))
        cid = _cell_id(ci, res)
        t_s, i_s = _sweep(grid, cid, act, org, dirn, tnear,
                          jnp.minimum(tfar, best_t), res, rt, use_cull,
                          interpret)
        better = t_s < best_t
        best_t = jnp.where(better, t_s, best_t)
        best_i = jnp.where(better, i_s, best_i)
        ci, tnext, entry, inside = _dda_step(ci, tnext, tdelta, step, res)
        live = live & inside

    # fallback: rays still marching with entry below their bound finish
    # on the stack kernel, bounded by the running best t
    remaining = live & (entry <= jnp.minimum(tfar, best_t))
    tf_fb = jnp.where(remaining, jnp.minimum(tfar, best_t), -1.0)
    h = ppt.intersect_packet_sorted(nodes, tris, org, dirn, tnear, tf_fb,
                                    bbox_lo, bbox_hi, max_leaf=max_leaf,
                                    interpret=interpret, hbm=hbm,
                                    use_cull=use_cull)
    # merge: fallback returns ORIGINAL triangle ids; map grid winners
    tri_grid = jnp.where(best_i >= 0,
                         grid['tri_orig'][jnp.maximum(best_i, 0)], -1)
    fb_better = h.t < best_t
    t = jnp.where(fb_better, h.t, best_t)
    tri = jnp.where(fb_better, h.tri, tri_grid)
    u, v = ppp.recompute_uv(grid['rows'], org, dirn, t,
                            jnp.where(fb_better, -1, best_i))
    u = jnp.where(fb_better, h.u, u)
    v = jnp.where(fb_better, h.v, v)
    t = jnp.where(tri >= 0, t, INF)
    return Hit(t, tri, u, v)


@partial(jax.jit, static_argnames=('res', 'rounds', 'rt', 'use_cull',
                                   'interpret', 'bbox_lo', 'bbox_hi',
                                   'max_leaf', 'hbm'))
def occluded_grid(grid, nodes, tris, org, dirn, tnear, tfar,
                  bbox_lo, bbox_hi, res: int = 8, rounds: int = 4,
                  rt: int = 8, max_leaf: int = 64, hbm: bool = False,
                  use_cull: bool = True, interpret: bool = False):
    """Exact any-hit via DDA rounds + bounded fallback.  Dead lanes
    (tfar <= tnear) report occluded=False (kernel contract)."""
    r = org.shape[0]
    ci, tnext, tdelta, step, t0, inside = _dda_init(
        grid['grid_lo'], grid['grid_hi'], res, org, dirn, tnear)
    dead = tfar <= tnear
    live = inside & ~dead & (t0 <= tfar)
    entry = t0
    occ = jnp.zeros((r,), bool)

    for _ in range(rounds):
        act = live & ~occ & (entry <= tfar)
        cid = _cell_id(ci, res)
        occ = occ | _sweep_occ(grid, cid, act, org, dirn, tnear, tfar,
                               res, rt, use_cull, interpret)
        ci, tnext, entry, inside = _dda_step(ci, tnext, tdelta, step, res)
        live = live & inside

    remaining = live & ~occ & (entry <= tfar)
    tf_fb = jnp.where(remaining, tfar, -1.0)
    occ = occ | ppt.occluded_packet_sorted(
        nodes, tris, org, dirn, tnear, tf_fb, bbox_lo, bbox_hi,
        max_leaf=max_leaf, interpret=interpret, hbm=hbm,
        use_cull=use_cull)
    return occ & ~dead
