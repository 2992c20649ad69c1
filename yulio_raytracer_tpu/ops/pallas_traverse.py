"""Pallas packet BVH traversal — the hot-op kernel for large scenes.

Design: **shared-stack packet traversal** (the TPU analog of the ISPC
device's ray packets, devices/device_ispc/renderers/pathtracer.ispc:13-22,
scaled from 2x2-SSE packets to 1024-ray TPU packets):

* each grid program owns a block of B rays resident in VMEM registers;
* ONE scalar traversal stack (SMEM) is shared by the whole block;
* **children-test-on-pop**: popping an interior node slab-tests both of
  its children against the packet and pushes only the hit ones — every
  node's box is tested exactly once, and misses never enter the stack
  (the round-1 kernel tested nodes on pop, so missed children still cost
  a full loop iteration);
* **ordered traversal**: the near child (by packet-dominant direction
  sign along the node's stored split axis) is pushed last so it pops
  first — t_best shrinks early and far subtrees get culled (the
  rtcIntersect near-child-first heuristic, Embree-class behavior);
* **pop culling**: each stack entry carries the packet-min entry
  distance; a popped entry whose tmin exceeds the packet-max best-t is
  skipped without touching its children;
* leaf triangles stream through scalar-indexed VMEM reads, each tested
  against all B rays at once (dense VPU work);
* per-ray state (best t/tri/u/v) lives in vector registers the whole time.

`occluded_packet` is a dedicated any-hit kernel: no closest-hit
bookkeeping, subtrees are pruned against the not-yet-occluded mask, and
traversal terminates outright once every ray in the packet is occluded
(the rtcOccluded fast path of pathtraceintegrator.cpp:160).

Node encoding (built by `pack_nodes`): (N, 8) f32 rows
  [lo.x lo.y lo.z hi.x hi.y hi.z  A  tag]
  tag  > 0: leaf, count = tag, A = first triangle (BVH-permuted order)
  tag <= 0: interior, A = right-child index (left child is i+1),
            split axis = -tag (stored as -(axis+1) .. so axis = -tag-1)
Triangles are packed EIGHT per 128-lane row ((G, 128) f32, G = ceil(T/8)):
tri t lives in row t//8 at lane offset (t%8)*16 with layout
[woop(12) | ng(3) | cull].  VMEM rows pad the lane dimension to 128, so a
(T, 16) layout would waste 8x memory; dynamic reads index only the sublane
dimension (lane offsets must be static), and the 8 sub-slices are unrolled
statically.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

BLOCK = 1024          # rays per packet (8 x 128 VPU tile)
STACK = 128
INF = float(np.inf)


def pack_nodes(bvh) -> np.ndarray:
    """FlatBVH -> (N, 8) f32 node rows (see module docstring)."""
    n = bvh.num_nodes
    idx = np.arange(n)
    interior = bvh.count == 0
    # DFS layout: left child = i+1, right child = skip[i+1] (the end of
    # the left subtree is where the right subtree starts)
    left = np.minimum(idx + 1, n - 1)
    right = np.zeros(n, np.int32)
    right[interior] = bvh.skip[left[interior]]
    a = np.where(interior, right, bvh.start).astype(np.float32)
    # traversal-order axis: the dominant separation axis of the two
    # children's box centroids (drives the near-child-first push)
    ctr = 0.5 * (bvh.lo.astype(np.float64) + bvh.hi.astype(np.float64))
    sep = np.abs(ctr[right] - ctr[left])
    sep[~np.isfinite(sep)] = 0.0
    axis = np.argmax(sep, axis=1).astype(np.int32)
    tag = np.where(interior, -(axis + 1), bvh.count).astype(np.float32)
    return np.concatenate([
        bvh.lo.astype(np.float32), bvh.hi.astype(np.float32),
        a[:, None], tag[:, None]], axis=1)


def pack_tris(woop: np.ndarray, geom_host: dict,
              pad_rows: int = 17) -> np.ndarray:
    """(G, 128) f32: 8 triangles per row, 16 floats each
    [woop.T flattened (12) | ng (3) | cull].  Zero padding rows are inert
    (woop zeros give d'_z == 0, which never passes the hit test).
    pad_rows extra zero rows let the HBM-streaming kernel DMA a
    static-size window past the last leaf (17 covers max_leaf <= 128)."""
    t = woop.shape[1] // 3
    w = np.asarray(woop, np.float32).reshape(4, t, 3)
    w = np.transpose(w, (1, 0, 2)).reshape(t, 12)
    flat = np.concatenate([
        w, np.asarray(geom_host['ng'], np.float32),
        np.asarray(geom_host['cull'], np.float32)[:, None]], axis=1)
    g = (t + 7) // 8 + pad_rows
    out = np.zeros((g * 8, 16), np.float32)
    out[:t] = flat
    return out.reshape(g, 128)


def _max_groups(max_leaf: int) -> int:
    return (max_leaf + 7) // 8 + 1


def _hbm_window(max_leaf: int) -> int:
    """HBM DMA window rows: the leaf window aligned down to the (8, 128)
    tile grid plus up to 7 rows of in-tile offset, rounded up to whole
    tiles (TPU DMA sources must start on tile boundaries)."""
    return ((_max_groups(max_leaf) + 7 + 7) // 8) * 8


def _leaf_groups(tris_ref, a, count, max_leaf, tri_test, carry,
                 tri_scratch=None, dma_sem=None):
    """Run tri_test on every 8-triangle packed row overlapping the leaf
    range [a, a+count).  Boundary rows test a few extra triangles, which
    is sound — every packed triangle is real scene geometry (padding rows
    can never pass the hit test).

    With tri_scratch/dma_sem set, tris_ref lives in HBM (scenes beyond
    VMEM — Embree keeps BVHs DRAM-resident, api/scene_flat.h): the leaf
    window is DMA'd into the VMEM scratch first.  pack_tris pads the
    array so the static-size window never reads past the end."""
    g_first = a // 8
    g_count = (a + count + 7) // 8 - g_first
    max_groups = _max_groups(max_leaf)

    if tri_scratch is not None:
        # align the window start to the (8, 128) tile grid — DMA with a
        # non-tile-aligned dynamic sublane offset faults the DMA engine
        g_base = (g_first // 8) * 8
        g_off = g_first - g_base
        cp = pltpu.make_async_copy(
            tris_ref.at[pl.ds(g_base, _hbm_window(max_leaf))],
            tri_scratch, dma_sem)
        cp.start()
        cp.wait()

    def group(g, carry):
        def do(carry2):
            if tri_scratch is not None:
                row = tri_scratch[g_off + g]       # (128,) = 8 tris
            else:
                row = tris_ref[g_first + g]
            for k in range(8):                     # static unroll
                carry2 = tri_test(row[16 * k:16 * (k + 1)],
                                  (g_first + g) * 8 + k, carry2)
            return carry2
        return jax.lax.cond(g < g_count, do, lambda c: c, carry)

    return jax.lax.fori_loop(0, max_groups, group, carry)


def _kernel(nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tn_ref, tf_ref,
            t_out, tri_out, u_out, v_out,
            stack_ref, stackt_ref, tri_scratch, dma_sem,
            max_leaf: int, hbm: bool, use_cull: bool,
            ordered: bool = True, counts_out=None):
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tnear = tn_ref[:]
    tfar0 = tf_ref[:]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-30, d,
                               jnp.where(d >= 0, 1e-30, -1e-30))

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)

    # packet-dominant direction sign per axis (scalar; drives child order).
    # Kept as i32 — chained scalar-bool selects can trip Mosaic's
    # arith.select legalization.
    sgn = ((jnp.sum(dx) >= 0.0).astype(jnp.int32),
           (jnp.sum(dy) >= 0.0).astype(jnp.int32),
           (jnp.sum(dz) >= 0.0).astype(jnp.int32))

    def slab(n, t_b):
        """Packet slab test against node n (scalar SMEM reads broadcast
        into vector ops). Returns (hit, tmin)."""
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

    stack_ref[0] = 0        # push root (tested lazily on pop)
    stackt_ref[0] = 0.0

    def cond(state):
        return state[0] >= 0

    def body(state):
        if counts_out is None:
            sp, t_best, tri_best, u_best, v_best, t_allmax = state
            cnt = None
        else:
            sp, t_best, tri_best, u_best, v_best, t_allmax, cnt = state
        node = stack_ref[sp]
        tpop = stackt_ref[sp] if ordered else jnp.float32(0.0)
        sp = sp - 1

        def process(carry):
            if counts_out is None:
                sp, t_best, tri_best, u_best, v_best, t_allmax = carry
                cnt = None
            else:
                sp, t_best, tri_best, u_best, v_best, t_allmax, cnt = carry
            a = nodes_ref[8 * node + 6].astype(jnp.int32)
            tag = nodes_ref[8 * node + 7].astype(jnp.int32)
            is_leaf = tag > 0
            if cnt is not None:
                rows = jnp.where(is_leaf,
                                 (a + tag + 7) // 8 - a // 8, 0)
                cnt = (cnt[0], cnt[1],
                       cnt[2] + is_leaf.astype(jnp.int32), cnt[3] + rows)

            def do_leaf(carry2):
                t_b, tri_b, u_b, v_b, _ = carry2

                def tri_test(w, tri_index, c):
                    t_b, tri_b, u_b, v_b = c
                    oup = ox * w[0] + oy * w[3] + oz * w[6] + w[9]
                    ovp = ox * w[1] + oy * w[4] + oz * w[7] + w[10]
                    owp = ox * w[2] + oy * w[5] + oz * w[8] + w[11]
                    dup = dx * w[0] + dy * w[3] + dz * w[6]
                    dvp = dx * w[1] + dy * w[4] + dz * w[7]
                    dwp = dx * w[2] + dy * w[5] + dz * w[8]
                    inv_dw = jnp.where(jnp.abs(dwp) > 1e-12, 1.0 / dwp, 0.0)
                    th = -owp * inv_dw
                    uh = oup + th * dup
                    vh = ovp + th * dvp
                    ok = ((jnp.abs(dwp) > 1e-12)
                          & (uh >= 0.0) & (vh >= 0.0) & (uh + vh <= 1.0)
                          & (th > tnear) & (th < t_b))
                    if use_cull:
                        # scalar-predicate boolean select doesn't legalize
                        # in Mosaic — use boolean algebra
                        ngd = dx * w[12] + dy * w[13] + dz * w[14]
                        ok = ok & ((w[15] != 1.0) | (ngd < 0.0))
                    return (jnp.where(ok, th, t_b),
                            jnp.where(ok, tri_index, tri_b),
                            jnp.where(ok, uh, u_b),
                            jnp.where(ok, vh, v_b))

                t_b, tri_b, u_b, v_b = _leaf_groups(
                    tris_ref, a, tag, max_leaf, tri_test,
                    (t_b, tri_b, u_b, v_b),
                    tri_scratch if hbm else None,
                    dma_sem if hbm else None)
                # pop-cull bound: the packet's farthest effective t
                # (t_b starts at tfar0, so it is already capped)
                t_am = jnp.max(t_b)
                return t_b, tri_b, u_b, v_b, t_am

            def do_interior(carry2):
                t_b, tri_b, u_b, v_b, t_am = carry2
                hit_l, tmin_l = slab(node + 1, t_b)
                hit_r, tmin_r = slab(a, t_b)
                any_l = jnp.any(hit_l)
                any_r = jnp.any(hit_r)
                if not ordered:
                    # ablation knob (measured: ordering + pop culling win
                    # ~30% even on sorted-incoherent packets — 1.93 vs
                    # 1.48 Mrps at 92k tris — so ordered stays default)
                    z = jnp.float32(0.0)
                    return any_l, any_r, z, z, jnp.bool_(True)
                m_l = jnp.min(jnp.where(hit_l, tmin_l, INF))
                m_r = jnp.min(jnp.where(hit_r, tmin_r, INF))
                axis = -tag - 1
                # left-first iff the packet travels in +axis direction
                left_near = jnp.where(
                    axis == 0, sgn[0],
                    jnp.where(axis == 1, sgn[1], sgn[2])) != 0
                return any_l, any_r, m_l, m_r, left_near

            def skip_interior(carry2):
                f = jnp.bool_(False)
                z = jnp.float32(0.0)
                return f, f, z, z, f

            # leaves mutate the vector bests; interiors produce push info
            leaf_out = jax.lax.cond(
                is_leaf, do_leaf, lambda c: c,
                (t_best, tri_best, u_best, v_best, t_allmax))
            any_l, any_r, m_l, m_r, left_near = jax.lax.cond(
                is_leaf, skip_interior, do_interior,
                (t_best, tri_best, u_best, v_best, t_allmax))
            t_best, tri_best, u_best, v_best, t_allmax = leaf_out

            # ordered push: far child first so the near child pops first
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
                if ordered:
                    stackt_ref[sp1] = far_m

            sp2 = sp1 + near_any.astype(jnp.int32)

            @pl.when(near_any)
            def _():
                stack_ref[sp2] = near_idx
                if ordered:
                    stackt_ref[sp2] = near_m

            if cnt is None:
                return sp2, t_best, tri_best, u_best, v_best, t_allmax
            return sp2, t_best, tri_best, u_best, v_best, t_allmax, cnt

        # pop culling: stale entries (pushed before t_best shrank) skipped
        live = jnp.bool_(True) if not ordered else tpop <= t_allmax
        if cnt is not None:
            cnt = (cnt[0] + 1,
                   cnt[1] + 1 - live.astype(jnp.int32), cnt[2], cnt[3])
            carry = (sp, t_best, tri_best, u_best, v_best, t_allmax, cnt)
        else:
            carry = (sp, t_best, tri_best, u_best, v_best, t_allmax)
        if not ordered:
            return process(carry)
        return jax.lax.cond(live, process, lambda c: c, carry)

    # t_best starts at tfar0 (not INF): every per-triangle and per-slab
    # min(tfar0, t_best) collapses to t_best.  Misses are detected via
    # tri == -1 (Hit.valid), never via t.
    init = (jnp.int32(0), tfar0,
            jnp.full((BLOCK,), -1, jnp.int32),
            jnp.zeros((BLOCK,)), jnp.zeros((BLOCK,)), jnp.float32(INF))
    if counts_out is not None:
        init = init + ((jnp.int32(0), jnp.int32(0), jnp.int32(0),
                        jnp.int32(0)),)
    out = jax.lax.while_loop(cond, body, init)
    t_best, tri_best, u_best, v_best = out[1], out[2], out[3], out[4]
    if counts_out is not None:
        cnt = out[6]
        counts_out[0, 0] = cnt[0]
        counts_out[0, 1] = cnt[1]
        counts_out[0, 2] = cnt[2]
        counts_out[0, 3] = cnt[3]
    # report INF for misses (round-1 kernel contract; tests key on it)
    t_out[:] = jnp.where(tri_best >= 0, t_best, INF)
    tri_out[:] = tri_best
    u_out[:] = u_best
    v_out[:] = v_best


def _vec_spec():
    return pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=('max_leaf', 'interpret', 'hbm',
                                   'use_cull', 'ordered', 'debug_counts'))
def intersect_packet(nodes, tris, org, dirn, tnear, tfar,
                     max_leaf: int = 64, interpret: bool = False,
                     hbm: bool = False, use_cull: bool = True,
                     ordered: bool = True, debug_counts: bool = False):
    """Closest-hit packet traversal.

    nodes: (N, 8) f32 (pack_nodes); tris: (G, 128) f32 (pack_tris);
    org/dirn: (R, 3) with R a multiple of BLOCK.  hbm=True keeps the
    triangle rows in HBM and DMA-streams leaf windows (scenes > VMEM).
    debug_counts=True additionally returns a (R//BLOCK, 4) i32 profile
    [pops, culled pops, leaf visits, tri rows] per packet (profiling
    builds only — the extra carry costs a few percent).
    """
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)
    tri_space = pltpu.ANY if hbm else pltpu.VMEM

    out_specs = [_vec_spec(), _vec_spec(), _vec_spec(), _vec_spec()]
    out_shape = [
        jax.ShapeDtypeStruct((r,), jnp.float32),
        jax.ShapeDtypeStruct((r,), jnp.int32),
        jax.ShapeDtypeStruct((r,), jnp.float32),
        jax.ShapeDtypeStruct((r,), jnp.float32),
    ]
    kernel = partial(_kernel, max_leaf=max_leaf, hbm=hbm,
                     use_cull=use_cull, ordered=ordered)
    if debug_counts:
        out_specs.append(pl.BlockSpec((1, 4), lambda i: (i, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((r // BLOCK, 4), jnp.int32))

        def kernel(*refs, _k=partial(_kernel, max_leaf=max_leaf, hbm=hbm,
                                     use_cull=use_cull, ordered=ordered)):
            ins, outs = refs[:10], refs[10:]
            _k(*ins, *outs[:4], *outs[5:], counts_out=outs[4])

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # nodes (scalar mem)
            pl.BlockSpec(memory_space=tri_space),    # tris (full)
            _vec_spec(), _vec_spec(), _vec_spec(),   # org xyz
            _vec_spec(), _vec_spec(), _vec_spec(),   # dir xyz
            _vec_spec(), _vec_spec(),                # tnear, tfar
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.float32),
                        pltpu.VMEM((_hbm_window(max_leaf), 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(nodes.reshape(-1), tris,
      org[:, 0], org[:, 1], org[:, 2],
      dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar)
    t, tri, u, v = outs[:4]
    if debug_counts:
        return Hit(t, tri, u, v), outs[4]
    return Hit(t, tri, u, v)


def _ray_sort_key(org, dirn, bbox_lo, bbox_hi):
    """Coherence key for wavefront ray binning: direction octant (3 high
    bits) then a 15-bit origin Morton code.  Bounce>=1 rays arrive in
    pixel order with scattered directions/origins; packets of
    same-octant, nearby-origin rays restore the frustum coherence the
    shared-stack traversal needs (measured: random rays 0.5 -> ~10+ Mrps).
    The reference never needed this — Embree's single-ray traversal is
    order-insensitive (pathtraceintegrator.cpp recursion); on TPU the
    packet IS the SIMD unit, so binning is the analog of Embree's
    internal ray-stream sorting (rtcIntersect1M)."""
    lo = jnp.asarray(bbox_lo, jnp.float32)
    span = jnp.maximum(jnp.asarray(bbox_hi, jnp.float32) - lo, 1e-6)
    q = jnp.clip((org - lo) / span, 0.0, 1.0)
    cell = (q * 31.0).astype(jnp.uint32)              # 5 bits per axis
    m = jnp.zeros(org.shape[0], jnp.uint32)
    for b in range(5):                                 # interleave (Morton)
        for a in range(3):
            bit = (cell[:, a] >> b) & 1
            m = m | (bit << jnp.uint32(3 * b + a))
    oct_ = ((dirn[:, 0] < 0).astype(jnp.uint32)
            | ((dirn[:, 1] < 0).astype(jnp.uint32) << 1)
            | ((dirn[:, 2] < 0).astype(jnp.uint32) << 2))
    return (oct_ << jnp.uint32(15)) | m


def _sorted_call(fn, n_outs, org, dirn, tnear, tfar, bbox_lo, bbox_hi):
    """Run fn on octant/Morton-sorted rays; unsort its outputs.  Dead
    rays (tfar <= tnear, the integrator's inactive-lane marker) sort to
    the very end so they fill all-dead packets that exit immediately."""
    key = _ray_sort_key(org, dirn, bbox_lo, bbox_hi)
    key = key | ((tfar <= tnear).astype(jnp.uint32) << jnp.uint32(30))
    perm = jnp.argsort(key)
    outs = fn(org[perm], dirn[perm], tnear[perm], tfar[perm])
    if n_outs == 1:
        outs = (outs,)
    # unsort by scatter (an inverse-permutation argsort would cost a
    # second full O(n log n) sort)
    outs = tuple(jnp.zeros_like(o).at[perm].set(o) for o in outs)
    return outs[0] if n_outs == 1 else outs


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull'))
def intersect_packet_sorted(nodes, tris, org, dirn, tnear, tfar,
                            bbox_lo, bbox_hi, max_leaf: int = 64,
                            interpret: bool = False,
                            hbm: bool = False, use_cull: bool = True) -> Hit:
    """Closest-hit with wavefront ray binning (see _ray_sort_key)."""
    def run(o, d, tn, tf):
        h = intersect_packet(nodes, tris, o, d, tn, tf,
                             max_leaf=max_leaf, interpret=interpret,
                             hbm=hbm, use_cull=use_cull)
        return (h.t, h.tri, h.u, h.v)

    t, tri, u, v = _sorted_call(run, 4, org, dirn, tnear, tfar,
                                bbox_lo, bbox_hi)
    return Hit(t, tri, u, v)


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull'))
def occluded_packet_sorted(nodes, tris, org, dirn, tnear, tfar,
                           bbox_lo, bbox_hi, max_leaf: int = 64,
                           interpret: bool = False, hbm: bool = False,
                           use_cull: bool = True):
    """Any-hit with wavefront ray binning (see _ray_sort_key)."""
    def run(o, d, tn, tf):
        return occluded_packet(nodes, tris, o, d, tn, tf,
                               max_leaf=max_leaf, interpret=interpret,
                               hbm=hbm, use_cull=use_cull)

    return _sorted_call(run, 1, org, dirn, tnear, tfar, bbox_lo, bbox_hi)


def _kernel_any(nodes_ref, tris_ref,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                tn_ref, tf_ref, occ_out,
                stack_ref, tri_scratch, dma_sem,
                max_leaf: int, hbm: bool, use_cull: bool):
    """Any-hit: unordered traversal pruned against the not-yet-occluded
    mask, terminating as soon as the whole packet is occluded.  occ is
    carried as i32 (Mosaic can't carry i1 vectors through scf loops)."""
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tnear = tn_ref[:]
    tfar = tf_ref[:]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-30, d,
                               jnp.where(d >= 0, 1e-30, -1e-30))

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)
    # near-child-first ordering helps any-hit too: occluders are found
    # sooner, lanes drop out of the active mask, subtrees prune earlier
    sgn = ((jnp.sum(dx) >= 0.0).astype(jnp.int32),
           (jnp.sum(dy) >= 0.0).astype(jnp.int32),
           (jnp.sum(dz) >= 0.0).astype(jnp.int32))

    def slab_unocc(n, unocc):
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
                           jnp.minimum(jnp.maximum(t0z, t1z), tfar))
        return jnp.any((tmin <= tmax) & unocc)

    stack_ref[0] = 0

    def cond(state):
        sp, occ, done = state
        return (sp >= 0) & jnp.logical_not(done)


    def body(state):
        sp, occ, done = state
        node = stack_ref[sp]
        sp = sp - 1
        a = nodes_ref[8 * node + 6].astype(jnp.int32)
        tag = nodes_ref[8 * node + 7].astype(jnp.int32)
        is_leaf = tag > 0
        unocc = occ == 0

        def do_leaf(carry):
            occ, _ = carry

            def tri_test(w, _tri_index, occ):
                oup = ox * w[0] + oy * w[3] + oz * w[6] + w[9]
                ovp = ox * w[1] + oy * w[4] + oz * w[7] + w[10]
                owp = ox * w[2] + oy * w[5] + oz * w[8] + w[11]
                dup = dx * w[0] + dy * w[3] + dz * w[6]
                dvp = dx * w[1] + dy * w[4] + dz * w[7]
                dwp = dx * w[2] + dy * w[5] + dz * w[8]
                inv_dw = jnp.where(jnp.abs(dwp) > 1e-12, 1.0 / dwp, 0.0)
                th = -owp * inv_dw
                uh = oup + th * dup
                vh = ovp + th * dvp
                hit = ((jnp.abs(dwp) > 1e-12)
                       & (uh >= 0.0) & (vh >= 0.0) & (uh + vh <= 1.0)
                       & (th > tnear) & (th < tfar))
                if use_cull:
                    ngd = dx * w[12] + dy * w[13] + dz * w[14]
                    hit = hit & ((w[15] != 1.0) | (ngd < 0.0))
                return jnp.maximum(occ, hit.astype(jnp.int32))

            occ = _leaf_groups(tris_ref, a, tag, max_leaf, tri_test, occ,
                               tri_scratch if hbm else None,
                               dma_sem if hbm else None)
            # early exit once the whole packet is occluded (rtcOccluded's
            # first-hit semantics, amortized over the packet)
            return occ, jnp.all(occ > 0)

        def do_interior(carry):
            occ, done = carry
            hit_l = slab_unocc(node + 1, unocc)
            hit_r = slab_unocc(a, unocc)
            return hit_l, hit_r

        occ, done = jax.lax.cond(is_leaf, do_leaf, lambda c: c, (occ, done))
        push_l, push_r = jax.lax.cond(
            is_leaf, lambda c: (jnp.bool_(False), jnp.bool_(False)),
            do_interior, (occ, done))

        axis = -tag - 1
        left_near = jnp.where(
            axis == 0, sgn[0], jnp.where(axis == 1, sgn[1], sgn[2])) != 0
        near_idx = jnp.where(left_near, node + 1, a)
        far_idx = jnp.where(left_near, a, node + 1)
        push_near = jnp.where(left_near, push_l, push_r)
        push_far = jnp.where(left_near, push_r, push_l)

        sp1 = sp + push_far.astype(jnp.int32)

        @pl.when(push_far)
        def _():
            stack_ref[sp1] = far_idx

        sp2 = sp1 + push_near.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[sp2] = near_idx

        return sp2, occ, done

    # dead lanes (tfar <= tnear, the integrator's inactive marker) start
    # as occluded: they can never hit anything, so leaving them at 0
    # would keep the all-occluded early exit from ever firing in mixed
    # packets.  They are masked back to 0 on output.
    dead = (tfar <= tnear).astype(jnp.int32)
    init = (jnp.int32(0), dead, jnp.bool_(False))
    _, occ, _ = jax.lax.while_loop(cond, body, init)
    occ_out[:] = occ * (1 - dead)


@partial(jax.jit, static_argnames=('max_leaf', 'interpret', 'hbm',
                                   'use_cull'))
def occluded_packet(nodes, tris, org, dirn, tnear, tfar,
                    max_leaf: int = 64, interpret: bool = False,
                    hbm: bool = False, use_cull: bool = True):
    """Any-hit packet traversal (early-exit shadow kernel)."""
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)
    tri_space = pltpu.ANY if hbm else pltpu.VMEM

    occ = pl.pallas_call(
        partial(_kernel_any, max_leaf=max_leaf, hbm=hbm,
                use_cull=use_cull),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # nodes (scalar mem)
            pl.BlockSpec(memory_space=tri_space),    # tris (full)
            _vec_spec(), _vec_spec(), _vec_spec(),
            _vec_spec(), _vec_spec(), _vec_spec(),
            _vec_spec(), _vec_spec(),
        ],
        out_specs=_vec_spec(),
        out_shape=jax.ShapeDtypeStruct((r,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.VMEM((_hbm_window(max_leaf), 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(nodes.reshape(-1), tris,
      org[:, 0], org[:, 1], org[:, 2],
      dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar)
    return occ != 0


# ---------------------------------------------------------------------------
# Motion blur (bvh4mb analog): a static BVH built over the UNION of each
# triangle's t=0 and t=1 bounds (exact for the linear vertex motion of
# trianglemesh_full.cpp:29-33), with a time-aware Moller-Trumbore leaf
# test — v(t) = v + t*dv evaluated per ray.  The reference renders these
# scenes with Embree's -accel bvh4mb (models/sphere_motion.ecs).
# ---------------------------------------------------------------------------

MB_STRIDE = 32           # floats per motion triangle (4 per 128-lane row)


def pack_tris_mb(geom_host: dict) -> np.ndarray:
    """(G, 128) f32: 4 motion triangles per row, 32 floats each
    [v0(3) e1(3) e2(3) mv0(3) me1(3) me2(3) cull | pad].  Zero padding
    rows are inert (zero edges give det == 0)."""
    v0 = np.asarray(geom_host['v0'], np.float32)
    t = v0.shape[0]
    flat = np.zeros((t, MB_STRIDE), np.float32)
    flat[:, 0:3] = v0
    flat[:, 3:6] = geom_host['e1']
    flat[:, 6:9] = geom_host['e2']
    flat[:, 9:12] = geom_host['mv0']
    flat[:, 12:15] = geom_host['me1']
    flat[:, 15:18] = geom_host['me2']
    flat[:, 18] = geom_host['cull']
    flat[~np.asarray(geom_host['valid'], bool)] = 0.0
    g = (t + 3) // 4
    out = np.zeros((g * 4, MB_STRIDE), np.float32)
    out[:t] = flat
    return out.reshape(g, 128)


def motion_bounds(v0, e1, e2, mv0, me1, me2):
    """Per-triangle union bounds over t in [0, 1] (linear motion: the
    union of the t=0 and t=1 triangle boxes is exact)."""
    cs = [v0, v0 + e1, v0 + e2]
    cs += [c + m for c, m in zip(cs, (mv0, mv0 + me1, mv0 + me2))]
    lo = np.min(np.stack(cs), axis=0)
    hi = np.max(np.stack(cs), axis=0)
    return lo.astype(np.float64), hi.astype(np.float64)


def _mb_leaf_groups(tris_ref, a, count, max_leaf, tri_test, carry):
    """4-triangle packed rows (MB_STRIDE floats each)."""
    g_first = a // 4
    g_count = (a + count + 3) // 4 - g_first
    max_groups = (max_leaf + 3) // 4 + 1

    def group(g, carry):
        def do(carry2):
            row = tris_ref[g_first + g]            # (128,) = 4 tris
            for k in range(4):                     # static unroll
                carry2 = tri_test(row[MB_STRIDE * k:MB_STRIDE * (k + 1)],
                                  (g_first + g) * 4 + k, carry2)
            return carry2
        return jax.lax.cond(g < g_count, do, lambda c: c, carry)

    return jax.lax.fori_loop(0, max_groups, group, carry)


def _mb_tri_test(w, time, ox, oy, oz, dx, dy, dz):
    """Time-aware Moller-Trumbore of one motion triangle against the
    packet.  Returns (ok, th, uh, vh) (each (BLOCK,))."""
    e1x = w[3] + time * w[12]
    e1y = w[4] + time * w[13]
    e1z = w[5] + time * w[14]
    e2x = w[6] + time * w[15]
    e2y = w[7] + time * w[16]
    e2z = w[8] + time * w[17]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    # cull: reject back faces (ng . d >= 0) for cull-enabled triangles
    ngx = e1y * e2z - e1z * e2y
    ngy = e1z * e2x - e1x * e2z
    ngz = e1x * e2y - e1y * e2x
    ngd = dx * ngx + dy * ngy + dz * ngz
    cull_ok = (w[18] != 1.0) | (ngd < 0.0)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvx = ox - (w[0] + time * w[9])
    tvy = oy - (w[1] + time * w[10])
    tvz = oz - (w[2] + time * w[11])
    uh = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    vh = (dx * qx + dy * qy + dz * qz) * inv_det
    th = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((jnp.abs(det) > 1e-12)
          & (uh >= 0.0) & (vh >= 0.0) & (uh + vh <= 1.0)
          & cull_ok)
    return ok, th, uh, vh


def _kernel_mb(nodes_ref, tris_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tn_ref, tf_ref, time_ref,
               t_out, tri_out, u_out, v_out,
               stack_ref, stackt_ref, max_leaf: int):
    """Closest-hit motion variant of _kernel (same ordered children-on-pop
    traversal; union-bounds nodes are valid for every t)."""
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tnear = tn_ref[:]
    tfar0 = tf_ref[:]
    time = time_ref[:]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) > 1e-30, d,
                               jnp.where(d >= 0, 1e-30, -1e-30))

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)
    sgn = ((jnp.sum(dx) >= 0.0).astype(jnp.int32),
           (jnp.sum(dy) >= 0.0).astype(jnp.int32),
           (jnp.sum(dz) >= 0.0).astype(jnp.int32))

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
                           jnp.minimum(jnp.maximum(t0z, t1z),
                                       jnp.minimum(tfar0, t_b)))
        return tmin <= tmax, tmin

    stack_ref[0] = 0
    stackt_ref[0] = 0.0

    def cond(state):
        return state[0] >= 0

    def body(state):
        sp, t_best, tri_best, u_best, v_best, t_allmax = state
        node = stack_ref[sp]
        tpop = stackt_ref[sp]
        sp = sp - 1

        def process(carry):
            sp, t_best, tri_best, u_best, v_best, t_allmax = carry
            a = nodes_ref[8 * node + 6].astype(jnp.int32)
            tag = nodes_ref[8 * node + 7].astype(jnp.int32)
            is_leaf = tag > 0

            def do_leaf(carry2):
                t_b, tri_b, u_b, v_b, _ = carry2

                def tri_test(w, tri_index, c):
                    t_b, tri_b, u_b, v_b = c
                    ok, th, uh, vh = _mb_tri_test(w, time, ox, oy, oz,
                                                  dx, dy, dz)
                    ok = ok & (th > tnear) & (th < jnp.minimum(tfar0, t_b))
                    return (jnp.where(ok, th, t_b),
                            jnp.where(ok, tri_index, tri_b),
                            jnp.where(ok, uh, u_b),
                            jnp.where(ok, vh, v_b))

                t_b, tri_b, u_b, v_b = _mb_leaf_groups(
                    tris_ref, a, tag, max_leaf, tri_test,
                    (t_b, tri_b, u_b, v_b))
                t_am = jnp.max(jnp.minimum(t_b, tfar0))
                return t_b, tri_b, u_b, v_b, t_am

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
                f = jnp.bool_(False)
                z = jnp.float32(0.0)
                return f, f, z, z, f

            leaf_out = jax.lax.cond(
                is_leaf, do_leaf, lambda c: c,
                (t_best, tri_best, u_best, v_best, t_allmax))
            any_l, any_r, m_l, m_r, left_near = jax.lax.cond(
                is_leaf, skip_interior, do_interior,
                (t_best, tri_best, u_best, v_best, t_allmax))
            t_best, tri_best, u_best, v_best, t_allmax = leaf_out

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

            return sp2, t_best, tri_best, u_best, v_best, t_allmax

        live = tpop <= t_allmax
        return jax.lax.cond(
            live, process, lambda c: c,
            (sp, t_best, tri_best, u_best, v_best, t_allmax))

    init = (jnp.int32(0), jnp.full((BLOCK,), INF),
            jnp.full((BLOCK,), -1, jnp.int32),
            jnp.zeros((BLOCK,)), jnp.zeros((BLOCK,)), jnp.float32(INF))
    out = jax.lax.while_loop(cond, body, init)
    _, t_best, tri_best, u_best, v_best, _ = out
    t_out[:] = t_best
    tri_out[:] = tri_best
    u_out[:] = u_best
    v_out[:] = v_best


@partial(jax.jit, static_argnames=('max_leaf', 'interpret'))
def intersect_packet_mb(nodes, tris_mb, org, dirn, tnear, tfar, time,
                        max_leaf: int = 64, interpret: bool = False) -> Hit:
    """Closest-hit packet traversal with linear motion blur.

    nodes must be built over motion_bounds; tris_mb from pack_tris_mb;
    time: (R,) in [0, 1].
    """
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)

    t, tri, u, v = pl.pallas_call(
        partial(_kernel_mb, max_leaf=max_leaf),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # motion tris
            _vec_spec(), _vec_spec(), _vec_spec(),
            _vec_spec(), _vec_spec(), _vec_spec(),
            _vec_spec(), _vec_spec(), _vec_spec(),   # tnear, tfar, time
        ],
        out_specs=[_vec_spec(), _vec_spec(), _vec_spec(), _vec_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.int32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.float32)],
        interpret=interpret,
    )(nodes.reshape(-1), tris_mb,
      org[:, 0], org[:, 1], org[:, 2],
      dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar, time)
    return Hit(t, tri, u, v)


def occluded_packet_mb(nodes, tris_mb, org, dirn, tnear, tfar, time,
                       max_leaf: int = 64, interpret: bool = False):
    """Any-hit motion traversal (closest-hit + finiteness; motion scenes
    are small enough that a dedicated early-exit variant is not worth a
    second kernel compile)."""
    hit = intersect_packet_mb(nodes, tris_mb, org, dirn, tnear, tfar,
                              time, max_leaf=max_leaf, interpret=interpret)
    return hit.tri >= 0
