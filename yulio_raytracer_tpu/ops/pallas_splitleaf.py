"""Split-leaf packet traversal: per-sub-block deferred leaf sweeps.

The shared-stack packet kernel (pallas_traverse.py) tests every popped
leaf row against ALL 1024 rays of the packet.  Honest counters (round 3,
scripts/diag_union.py) show that for sorted bounce-1 rays this union
costs ~24k pair-slots/ray while a single ray only needs ~130 — and that
the union of a 128-ray block is 4-6x smaller than the 1024-ray union.

This kernel keeps the node phase EXACTLY as the packet kernel (one
shared scalar stack per 1024-ray packet: children-test-on-pop, ordered
near-first pushes, pop culling) — node work is a minority cost and the
1024-way sharing keeps the scalar unit off the critical path — but
defers leaf triangle work into EIGHT per-sub-block row lists:

* sub-block k = sublane k = rays 128k..128k+127 of the packet (the ray
  sort order makes these 128 consecutive sorted rays, far more coherent
  than the packet);
* when a leaf pops, its packed tri rows are appended only to the lists
  of sub-blocks whose 128 rays actually hit the leaf box (per-sublane
  slab mask, already best-t-culled);
* every ~FLUSH_ROWS appended rows the lists are flushed: round r tests
  list_k[r] for every k simultaneously — one (8,128) tile op sequence
  where sublane k sweeps ITS OWN row (8 dynamic row reads assembled by
  sublane, triangle constants lane-sliced pairs-style out of the
  assembled register).  Every sub-block only ever pays for rows ITS
  rays need; the tile stays full width.

Periodic flushing keeps t_best fresh (pop culling and slab tmax stay
within ~FLUSH_ROWS rows of exact), so traversal-order quality matches
the in-line kernel.

Reference behavior matched: rtcIntersect/rtcOccluded exactness
(devices/device_singleray/api/scene_flat.h:90-108) including back-face
culling (trianglemesh_normals.cpp:68-104); this kernel is the
RTC_SCENE_INCOHERENT analog (scene_flat.h:96) — a traversal tuned for
divergent secondary rays.

Triangle rows must be VMEM-resident (scenes up to a few hundred k tris;
HBM-streamed scenes keep the window-DMA packet kernel).

MEASURED (round 3, honest fetch-synced timing, colonnade 512^2
bounce-1 sorted, amortize 8): **1.23 Mrps vs 1.44 for the in-line
packet kernel** — a LOSS; camera rays 18.0 vs 20.0.  The per-round
overhead (8 dynamic sublane row reads + 8 broadcast-selects to
assemble the per-sub-block row tile, plus ~max_groups*8 conditional
scalar SMEM appends per leaf pop on the already scalar-tight critical
path) exceeds the 4-6x union saving.  Kept as a measured ablation; the
production default stays the in-line kernel.  Key corollary of this
measurement: at the union's ~24k pair-slots/ray the in-line kernel's
leaf sweeps already sustain ~35 Gpairs/s — ABOVE the standalone dense
kernel's 26.3 — so per-pair VPU efficiency is at the ceiling and
throughput gains must come from testing fewer pairs per ray, not from
kernel micro-structure.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, BARY_EPS

BLOCK = 1024          # rays per packet (8 sub-blocks x 128 lanes)
NSUB = 8              # sub-blocks (sublane dim)
SUB = BLOCK // NSUB   # rays per sub-block (lane dim)
STACK = 128
LISTCAP = 48          # pending rows per sub-block between flushes
INF = float(np.inf)


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) > 1e-30, d,
                           jnp.where(d >= 0, 1e-30, -1e-30))


def _sub_any(mask):
    """Per-sublane any over lanes -> (NSUB, 1) i32."""
    return jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)


def _flush(tris_ref, list_ref, cnt_ref, sentinel_row,
           ox, oy, oz, dx, dy, dz, tnear,
           t_best, tri_best, u_best, v_best, use_cull: bool):
    """Sweep all pending rows: round r tests row list_k[r] of every
    sub-block k at once.  Returns updated bests."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (NSUB, 1), 0)

    maxcnt = cnt_ref[0]
    for k in range(1, NSUB):
        maxcnt = jnp.maximum(maxcnt, cnt_ref[k])

    def round_(r, carry):
        t_b, tri_b, u_b, v_b = carry
        # per-sublane row index (sentinel = inert zero padding row)
        gs = []
        for k in range(NSUB):
            gs.append(jnp.where(r < cnt_ref[k], list_ref[k, r],
                                sentinel_row))
        # assemble (NSUB, 128): sublane k = its row's 128 floats
        rmat = jnp.zeros((NSUB, 128), jnp.float32)
        gcol = jnp.zeros((NSUB, 1), jnp.int32)
        for k in range(NSUB):
            row = tris_ref[gs[k]]                     # (128,) dynamic
            rmat = jnp.where(sub == k,
                             jnp.broadcast_to(row[None, :], (NSUB, 128)),
                             rmat)
            gcol = jnp.where(sub == k, gs[k], gcol)

        def c(m, j):
            return rmat[:, 16 * m + j:16 * m + j + 1]  # (NSUB,1) slice

        for m in range(8):                             # 8 tris per row
            oup = ox * c(m, 0) + oy * c(m, 3) + oz * c(m, 6) + c(m, 9)
            ovp = ox * c(m, 1) + oy * c(m, 4) + oz * c(m, 7) + c(m, 10)
            owp = ox * c(m, 2) + oy * c(m, 5) + oz * c(m, 8) + c(m, 11)
            dup = dx * c(m, 0) + dy * c(m, 3) + dz * c(m, 6)
            dvp = dx * c(m, 1) + dy * c(m, 4) + dz * c(m, 7)
            dwp = dx * c(m, 2) + dy * c(m, 5) + dz * c(m, 8)
            inv_dw = jnp.where(jnp.abs(dwp) > 1e-12, 1.0 / dwp, 0.0)
            th = -owp * inv_dw
            uh = oup + th * dup
            vh = ovp + th * dvp
            ok = ((jnp.abs(dwp) > 1e-12)
                  & (uh >= -BARY_EPS) & (vh >= -BARY_EPS) & (uh + vh <= 1.0 + BARY_EPS)
                  & (th > tnear) & (th < t_b))
            if use_cull:
                ngd = dx * c(m, 12) + dy * c(m, 13) + dz * c(m, 14)
                ok = ok & ((c(m, 15) != 1.0) | (ngd < 0.0))
            tri_m = gcol * 8 + m
            t_b = jnp.where(ok, th, t_b)
            tri_b = jnp.where(ok, tri_m, tri_b)
            u_b = jnp.where(ok, uh, u_b)
            v_b = jnp.where(ok, vh, v_b)
        return t_b, tri_b, u_b, v_b

    out = jax.lax.fori_loop(0, maxcnt, round_,
                            (t_best, tri_best, u_best, v_best))
    for k in range(NSUB):
        cnt_ref[k] = 0
    return out


def _kernel(nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tn_ref, tf_ref,
            t_out, tri_out, u_out, v_out,
            stack_ref, stackt_ref, list_ref, cnt_ref,
            max_leaf: int, use_cull: bool):
    ox = ox_ref[:].reshape(NSUB, SUB)
    oy = oy_ref[:].reshape(NSUB, SUB)
    oz = oz_ref[:].reshape(NSUB, SUB)
    dx = dx_ref[:].reshape(NSUB, SUB)
    dy = dy_ref[:].reshape(NSUB, SUB)
    dz = dz_ref[:].reshape(NSUB, SUB)
    tnear = tn_ref[:].reshape(NSUB, SUB)
    tfar0 = tf_ref[:].reshape(NSUB, SUB)

    ix = _safe_inv(dx)
    iy = _safe_inv(dy)
    iz = _safe_inv(dz)
    sgn = ((jnp.sum(dx) >= 0.0).astype(jnp.int32),
           (jnp.sum(dy) >= 0.0).astype(jnp.int32),
           (jnp.sum(dz) >= 0.0).astype(jnp.int32))

    sentinel_row = tris_ref.shape[0] - 1   # zero padding row (pack_tris)
    max_groups = (max_leaf + 7) // 8 + 1

    def slab(n, t_b):
        b = 8 * n
        t0x = (nodes_ref[b + 0] - ox) * ix
        t1x = (nodes_ref[b + 3] - ox) * ix
        t0y = (nodes_ref[b + 1] - oy) * iy
        t1y = (nodes_ref[b + 4] - oy) * iy
        t0z = (nodes_ref[b + 2] - oz) * iz
        t1z = (nodes_ref[b + 5] - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), tnear))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), t_b))
        return tmin <= tmax, tmin

    def do_flush(carry):
        t_b, tri_b, u_b, v_b = carry
        return _flush(tris_ref, list_ref, cnt_ref, sentinel_row,
                      ox, oy, oz, dx, dy, dz, tnear,
                      t_b, tri_b, u_b, v_b, use_cull)

    stack_ref[0] = 0
    stackt_ref[0] = 0.0
    for k in range(NSUB):
        cnt_ref[k] = 0

    # state: sp, t_best, tri_best, u_best, v_best, t_allmax, since
    # (`since` = rows appended since last flush — an upper bound on any
    # sub-block's pending count; flush before any list can overflow)
    def cond(state):
        return state[0] >= 0

    def body(state):
        sp, t_best, tri_best, u_best, v_best, t_allmax, since = state
        node = stack_ref[sp]
        tpop = stackt_ref[sp]
        sp = sp - 1

        def process(carry):
            sp, t_best, tri_best, u_best, v_best, t_allmax, since = carry
            a = nodes_ref[8 * node + 6].astype(jnp.int32)
            tag = nodes_ref[8 * node + 7].astype(jnp.int32)
            is_leaf = tag > 0

            def do_leaf(carry2):
                t_b, tri_b, u_b, v_b, t_am, since = carry2
                # re-test the leaf box for the per-sub-block masks (the
                # push-time mask isn't retained; 1 slab ~ a fraction of
                # one row sweep) — already best-t-culled via t_b
                hit_l, _ = slab(node, t_b)
                f = _sub_any(hit_l)                    # (NSUB, 1) i32
                g_first = a // 8
                g_count = (a + tag + 7) // 8 - g_first

                def app_row(g, _):
                    for k in range(NSUB):
                        @pl.when((f[k, 0] > 0) & (g < g_count))
                        def _(k=k, g=g):
                            list_ref[k, cnt_ref[k]] = g_first + g
                            cnt_ref[k] = cnt_ref[k] + 1
                    return 0
                jax.lax.fori_loop(0, max_groups, app_row, 0)
                since = since + jnp.where(jnp.sum(f) > 0, g_count, 0)

                def flush_now(c3):
                    t_b, tri_b, u_b, v_b = do_flush(c3)
                    return t_b, tri_b, u_b, v_b, jnp.int32(0)

                def no_flush(c3):
                    return c3 + (since,)

                t_b, tri_b, u_b, v_b, since = jax.lax.cond(
                    since >= LISTCAP - max_groups, flush_now, no_flush,
                    (t_b, tri_b, u_b, v_b))
                t_am = jnp.max(t_b)
                return t_b, tri_b, u_b, v_b, t_am, since

            def do_interior(carry2):
                t_b = carry2[0]
                hit_l, tmin_l = slab(node + 1, t_b)
                hit_r, tmin_r = slab(a, t_b)
                any_l = jnp.any(hit_l)
                any_r = jnp.any(hit_r)
                m_l = jnp.min(jnp.where(hit_l, tmin_l, INF))
                m_r = jnp.min(jnp.where(hit_r, tmin_r, INF))
                axis = -tag - 1
                left_near = jnp.where(
                    axis == 0, sgn[0],
                    jnp.where(axis == 1, sgn[1], sgn[2])) != 0
                return any_l, any_r, m_l, m_r, left_near

            def skip_interior(carry2):
                fzero = jnp.bool_(False)
                z = jnp.float32(0.0)
                return fzero, fzero, z, z, fzero

            leaf_out = jax.lax.cond(
                is_leaf, do_leaf, lambda c: c,
                (t_best, tri_best, u_best, v_best, t_allmax, since))
            any_l, any_r, m_l, m_r, left_near = jax.lax.cond(
                is_leaf, skip_interior, do_interior,
                (t_best, tri_best, u_best, v_best, t_allmax, since))
            t_best, tri_best, u_best, v_best, t_allmax, since = leaf_out

            near_idx = jnp.where(left_near, node + 1, a)
            far_idx = jnp.where(left_near, a, node + 1)
            near_m = jnp.where(left_near, m_l, m_r)
            far_m = jnp.where(left_near, m_r, m_l)
            near_any = jnp.where(left_near, any_l, any_r)
            far_any = jnp.where(left_near, any_r, any_l)

            sp1 = sp + far_any.astype(jnp.int32)

            @pl.when(far_any)
            def _():
                stack_ref[sp1] = far_idx
                stackt_ref[sp1] = far_m

            sp2 = sp1 + near_any.astype(jnp.int32)

            @pl.when(near_any)
            def _():
                stack_ref[sp2] = near_idx
                stackt_ref[sp2] = near_m

            return sp2, t_best, tri_best, u_best, v_best, t_allmax, since

        live = tpop <= t_allmax
        carry = (sp, t_best, tri_best, u_best, v_best, t_allmax, since)
        return jax.lax.cond(live, process, lambda c: c, carry)

    init = (jnp.int32(0), tfar0,
            jnp.full((NSUB, SUB), -1, jnp.int32),
            jnp.zeros((NSUB, SUB)), jnp.zeros((NSUB, SUB)),
            jnp.float32(INF), jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    _, t_best, tri_best, u_best, v_best, _, _ = out
    # final flush of any remaining rows
    t_best, tri_best, u_best, v_best = _flush(
        tris_ref, list_ref, cnt_ref, sentinel_row,
        ox, oy, oz, dx, dy, dz, tnear,
        t_best, tri_best, u_best, v_best, use_cull)

    t_out[:] = jnp.where(tri_best >= 0, t_best, INF).reshape(BLOCK)
    tri_out[:] = tri_best.reshape(BLOCK)
    u_out[:] = u_best.reshape(BLOCK)
    v_out[:] = v_best.reshape(BLOCK)


def _vec_spec():
    return pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=('max_leaf', 'use_cull', 'interpret'))
def intersect_packet_split(nodes, tris, org, dirn, tnear, tfar,
                           max_leaf: int = 64, use_cull: bool = True,
                           interpret: bool = False):
    """Closest-hit split-leaf traversal; contract identical to
    pallas_traverse.intersect_packet (INF t on miss).  VMEM tris only."""
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # nodes (scalar mem)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # tris (full)
        _vec_spec(), _vec_spec(), _vec_spec(),
        _vec_spec(), _vec_spec(), _vec_spec(),
        _vec_spec(), _vec_spec(),
    ]
    args = [nodes.reshape(-1), tris,
            org[:, 0], org[:, 1], org[:, 2],
            dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar]

    _k = partial(_kernel, max_leaf=max_leaf, use_cull=use_cull)

    t, tri, u, v = pl.pallas_call(
        _k,
        grid=grid,
        in_specs=in_specs,
        out_specs=[_vec_spec(), _vec_spec(), _vec_spec(), _vec_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.int32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.float32),
                        pltpu.SMEM((NSUB, LISTCAP), jnp.int32),
                        pltpu.SMEM((NSUB,), jnp.int32)],
        interpret=interpret,
    )(*args)
    return Hit(t, tri, u, v)


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'use_cull', 'interpret'))
def intersect_packet_split_sorted(nodes, tris, org, dirn, tnear, tfar,
                                  bbox_lo, bbox_hi, max_leaf: int = 64,
                                  use_cull: bool = True,
                                  interpret: bool = False) -> Hit:
    """Split-leaf closest-hit with wavefront ray binning (the
    pallas_traverse._ray_sort_key octant+Morton sort)."""
    from .pallas_traverse import _sorted_call

    def run(o, d, tn, tf):
        h = intersect_packet_split(nodes, tris, o, d, tn, tf,
                                   max_leaf=max_leaf, use_cull=use_cull,
                                   interpret=interpret)
        return (h.t, h.tri, h.u, h.v)

    t, tri, u, v = _sorted_call(run, 4, org, dirn, tnear, tfar,
                                bbox_lo, bbox_hi)
    return Hit(t, tri, u, v)
