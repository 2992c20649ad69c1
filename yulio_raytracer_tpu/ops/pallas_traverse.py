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

from .intersect import Hit, BARY_EPS

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


def treelet_cut(nodes: np.ndarray, max_treelets: int = 32):
    """Cut the packed BVH into <= max_treelets disjoint subtrees that
    together cover every leaf: repeatedly split the root with the largest
    subtree into its two children (a top-down analog of Embree's builder
    treelets).  Returns (roots (T,) i32, boxes (T, 6) f32 [lo|hi]).

    The box entry distance of a treelet lower-bounds the t of any hit
    inside it, so a ray's candidate treelets can be visited near-to-far
    with early termination against its running t_best — this is what lets
    the binned wavefront (intersect_packet_binned) skip most of the tree
    for incoherent rays where one shared-stack packet could not."""
    import heapq
    tag = nodes[:, 7]
    a = nodes[:, 6].astype(np.int64)
    n = nodes.shape[0]
    # subtree TRIANGLE counts (balance the cut by leaf work, not node
    # count — the dense-sweep path's cost is proportional to triangles)
    size = np.where(tag > 0, tag, 0).astype(np.int64)
    for i in range(n - 1, -1, -1):
        if tag[i] <= 0:
            size[i] = size[i + 1] + size[int(a[i])]
    # (-size, node): max-heap by subtree triangle count
    heap = [(-int(size[0]), 0)]
    while len(heap) < max_treelets:
        neg, i = heapq.heappop(heap)
        if tag[i] > 0:          # largest remaining is a leaf: done
            heapq.heappush(heap, (neg, i))
            break
        heapq.heappush(heap, (-int(size[i + 1]), i + 1))
        heapq.heappush(heap, (-int(size[int(a[i])]), int(a[i])))
    roots = np.asarray(sorted(i for _, i in heap), np.int32)
    boxes = np.concatenate([nodes[roots, 0:3], nodes[roots, 3:6]],
                           axis=1).astype(np.float32)
    return roots, boxes


def treelet_tri_tiles(nodes: np.ndarray, roots: np.ndarray,
                      tl: int = 128):
    """Per-treelet contiguous triangle-tile range [gs, ge) in the
    (Gt, 16, 128) planes layout of ops/pallas_pairs.py.

    DFS node order plus leaf-ordered triangle packing make every
    subtree's triangles one contiguous index range; rounding to tile
    boundaries only adds boundary triangles of neighboring treelets,
    which is harmless (they are real scene triangles — any hit found is
    a true hit)."""
    tag = nodes[:, 7]
    a = nodes[:, 6].astype(np.int64)
    n = nodes.shape[0]
    nsize = np.ones(n, np.int64)
    for i in range(n - 1, -1, -1):
        if tag[i] <= 0:
            nsize[i] = 1 + nsize[i + 1] + nsize[int(a[i])]
    gs = np.zeros(len(roots), np.int32)
    ge = np.zeros(len(roots), np.int32)
    for j, r in enumerate(np.asarray(roots)):
        end = int(r + nsize[r])
        leaf = tag[r:end] > 0
        starts = a[r:end][leaf]
        counts = tag[r:end][leaf].astype(np.int64)
        lo = int(starts.min())
        hi = int((starts + counts).max())
        gs[j] = lo // tl
        ge[j] = -(-hi // tl)
    return gs, ge


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
            ordered: bool = True, counts_out=None, roots_ref=None):
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

    # push the start root (tested lazily on pop); a per-packet root (the
    # binned wavefront's treelet) replaces the global root when given
    stack_ref[0] = (0 if roots_ref is None
                    else roots_ref[pl.program_id(0)])
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
                          & (uh >= -BARY_EPS) & (vh >= -BARY_EPS) & (uh + vh <= 1.0 + BARY_EPS)
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
        # flat 1-D SMEM layout: a 2-D (P, 4) SMEM output pads the minor
        # dim to 128 lanes (128 B/element — 512 KB for 16 KB of data),
        # which OOMs smem on scenes whose node table is already large
        cnt = out[6]
        pid = pl.program_id(0)
        counts_out[4 * pid + 0] = cnt[0]
        counts_out[4 * pid + 1] = cnt[1]
        counts_out[4 * pid + 2] = cnt[2]
        counts_out[4 * pid + 3] = cnt[3]
    # report INF for misses (round-1 kernel contract; tests key on it)
    t_out[:] = jnp.where(tri_best >= 0, t_best, INF)
    tri_out[:] = tri_best
    u_out[:] = u_best
    v_out[:] = v_best


def _vec_spec():
    return pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=('max_leaf', 'interpret', 'hbm',
                                   'use_cull', 'ordered', 'debug_counts'))
def intersect_packet(nodes, tris, org, dirn, tnear, tfar, roots=None,
                     max_leaf: int = 64, interpret: bool = False,
                     hbm: bool = False, use_cull: bool = True,
                     ordered: bool = True, debug_counts: bool = False):
    """Closest-hit packet traversal.

    nodes: (N, 8) f32 (pack_nodes); tris: (G, 128) f32 (pack_tris);
    org/dirn: (R, 3) with R a multiple of BLOCK.  hbm=True keeps the
    triangle rows in HBM and DMA-streams leaf windows (scenes > VMEM).
    roots: optional (R//BLOCK,) i32 per-packet start node (the binned
    wavefront's treelet root); None starts every packet at the global
    root.  debug_counts=True additionally returns a (R//BLOCK, 4) i32
    profile [pops, culled pops, leaf visits, tri rows] per packet
    (profiling builds only — the extra carry costs a few percent).
    """
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)
    tri_space = pltpu.ANY if hbm else pltpu.VMEM
    rooted = roots is not None

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # nodes (scalar mem)
        pl.BlockSpec(memory_space=tri_space),    # tris (full)
        _vec_spec(), _vec_spec(), _vec_spec(),   # org xyz
        _vec_spec(), _vec_spec(), _vec_spec(),   # dir xyz
        _vec_spec(), _vec_spec(),                # tnear, tfar
    ]
    args = [nodes.reshape(-1), tris,
            org[:, 0], org[:, 1], org[:, 2],
            dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar]
    if rooted:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(roots.astype(jnp.int32))
    n_in = len(in_specs)

    out_specs = [_vec_spec(), _vec_spec(), _vec_spec(), _vec_spec()]
    out_shape = [
        jax.ShapeDtypeStruct((r,), jnp.float32),
        jax.ShapeDtypeStruct((r,), jnp.int32),
        jax.ShapeDtypeStruct((r,), jnp.float32),
        jax.ShapeDtypeStruct((r,), jnp.float32),
    ]
    if debug_counts:
        # whole-array SMEM output, indexed by program id in the kernel
        # (blocked SMEM outputs must tile to (8, 128), which (1, 4) isn't);
        # kept FLAT — 2-D SMEM pads the minor dim to 128 lanes (OOM)
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((r // BLOCK * 4,), jnp.int32))

    _k = partial(_kernel, max_leaf=max_leaf, hbm=hbm,
                 use_cull=use_cull, ordered=ordered)

    def kernel(*refs):
        ins, rest = refs[:n_in], refs[n_in:]
        kw = {}
        if rooted:
            kw['roots_ref'] = ins[-1]
            ins = ins[:-1]
        if debug_counts:
            kw['counts_out'] = rest[4]
            rest = rest[:4] + rest[5:]
        _k(*ins, *rest, **kw)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.float32),
                        pltpu.VMEM((_hbm_window(max_leaf), 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(*args)
    t, tri, u, v = outs[:4]
    if debug_counts:
        return Hit(t, tri, u, v), outs[4].reshape(-1, 4)
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


def _sorted_call(fn, n_outs, org, dirn, tnear, tfar, bbox_lo, bbox_hi,
                 seg=None, perm=None):
    """Run fn on octant/Morton-sorted rays; unsort its outputs.  Dead
    rays (tfar <= tnear, the integrator's inactive-lane marker) sort to
    the very end so they fill all-dead packets that exit immediately.

    seg: optional (R,) small-int segment id sorted ABOVE the octant bits —
    NEE batches pass the light index so each packet holds rays converging
    on ONE light (a thin frustum) instead of an octant-wide mix of
    destinations (measured: mixed-light packets double the leaf union).

    perm: optional precomputed (R,) permutation that REPLACES the
    key+argsort (XLA argsort costs ~40-50 ms per million rays on v5e —
    by far the dominant wavefront-binning cost, measured by
    scripts/profile_grid.py).  The integrator reuses one hit-point
    Morton sort across all of a bounce's shadow batches this way."""
    if perm is None:
        key = _ray_sort_key(org, dirn, jnp.asarray(bbox_lo),
                            jnp.asarray(bbox_hi))
        if seg is not None:
            key = key | (seg.astype(jnp.uint32) << jnp.uint32(18))
        key = key | ((tfar <= tnear).astype(jnp.uint32) << jnp.uint32(30))
        perm = jnp.argsort(key)
    outs = fn(org[perm], dirn[perm], tnear[perm], tfar[perm])
    if n_outs == 1:
        outs = (outs,)
    # unsort by scatter (an inverse-permutation argsort would cost a
    # second full O(n log n) sort)
    outs = tuple(jnp.zeros_like(o).at[perm].set(o) for o in outs)
    return outs[0] if n_outs == 1 else outs


def hitpoint_sort_perm(org, bbox_lo, bbox_hi, live=None):
    """One origin-Morton argsort to be shared (via _sorted_call's `perm`)
    by every same-origin traversal batch of a bounce: the bounce's NEE
    shadow rays all start at the same hit points, so for nl lights this
    replaces an nl*R-ray argsort with R-ray gathers.  Dead/invalid rays
    (live=False) sort to the end."""
    key = _ray_sort_key(org, jnp.ones_like(org), jnp.asarray(bbox_lo),
                        jnp.asarray(bbox_hi)) & jnp.uint32(0x7FFF)
    if live is not None:
        key = key | ((~live).astype(jnp.uint32) << jnp.uint32(30))
    return jnp.argsort(key)


def tile_perm(perm, n_seg: int, r: int):
    """Concatenated-batch permutation: segment s keeps its rays in
    `perm` order (seg-major layout, one argsort total)."""
    return (jnp.arange(n_seg, dtype=perm.dtype)[:, None] * r
            + perm[None, :]).reshape(-1)


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
                           use_cull: bool = True, seg=None, perm=None):
    """Any-hit with wavefront ray binning (see _ray_sort_key); seg
    optionally groups packets by destination light; perm reuses a
    precomputed permutation instead of sorting (_sorted_call)."""
    def run(o, d, tn, tf):
        return occluded_packet(nodes, tris, o, d, tn, tf,
                               max_leaf=max_leaf, interpret=interpret,
                               hbm=hbm, use_cull=use_cull)

    return _sorted_call(run, 1, org, dirn, tnear, tfar, bbox_lo, bbox_hi,
                        seg=seg, perm=perm)


def _kernel_any(nodes_ref, tris_ref,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                tn_ref, tf_ref, occ_out,
                stack_ref, tri_scratch, dma_sem,
                max_leaf: int, hbm: bool, use_cull: bool,
                roots_ref=None):
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

    stack_ref[0] = (0 if roots_ref is None
                    else roots_ref[pl.program_id(0)])

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
                       & (uh >= -BARY_EPS) & (vh >= -BARY_EPS) & (uh + vh <= 1.0 + BARY_EPS)
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
def occluded_packet(nodes, tris, org, dirn, tnear, tfar, roots=None,
                    max_leaf: int = 64, interpret: bool = False,
                    hbm: bool = False, use_cull: bool = True):
    """Any-hit packet traversal (early-exit shadow kernel).  roots as in
    intersect_packet."""
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)
    tri_space = pltpu.ANY if hbm else pltpu.VMEM
    rooted = roots is not None

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # nodes (scalar mem)
        pl.BlockSpec(memory_space=tri_space),    # tris (full)
        _vec_spec(), _vec_spec(), _vec_spec(),
        _vec_spec(), _vec_spec(), _vec_spec(),
        _vec_spec(), _vec_spec(),
    ]
    args = [nodes.reshape(-1), tris,
            org[:, 0], org[:, 1], org[:, 2],
            dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar]
    if rooted:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(roots.astype(jnp.int32))
    n_in = len(in_specs)
    _k = partial(_kernel_any, max_leaf=max_leaf, hbm=hbm,
                 use_cull=use_cull)

    def kernel(*refs):
        ins, rest = refs[:n_in], refs[n_in:]
        kw = {}
        if rooted:
            kw['roots_ref'] = ins[-1]
            ins = ins[:-1]
        _k(*ins, *rest, **kw)

    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=_vec_spec(),
        out_shape=jax.ShapeDtypeStruct((r,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.VMEM((_hbm_window(max_leaf), 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(*args)
    return occ != 0


# ---------------------------------------------------------------------------
# Staged-t wavefront traversal.
#
# Measured on v5e (scripts/profile_phases.py, 92k-tri colonnade): an
# incoherent sorted packet pops ~10% of the tree but spends ~70% of its
# cycles on leaf triangle rows (949 rows/packet vs 23 for camera rays),
# and pop-culling never fires because one unresolved ray pins the packet
# bound at infinity.  Capping the segment fixes both at once: stage k
# traverses [D_{k-1}, D_k], so the packet's node/leaf union shrinks to a
# shell around the origins, and a closest hit found inside a cap is the
# global closest (any farther hit has larger t).  Rays that resolve in an
# early stage go dead (tfar = -1) for the rest, and all-dead packets exit
# in O(1), so later stages cost ~(surviving fraction).  In an enclosed
# scene most diffuse bounce rays hit within a small fraction of the scene
# diagonal, making stage 1 cheap and dominant.  One Morton/octant sort up
# front; stages reuse the SAME compiled kernel (per-ray tnear/tfar are
# runtime inputs).
# ---------------------------------------------------------------------------


def _staged_caps(bbox_lo, bbox_hi, stages):
    import math
    diag = math.sqrt(sum((h - l) ** 2
                         for l, h in zip(bbox_lo, bbox_hi)))
    return [diag * s for s in stages]


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull',
                                   'stages'))
def intersect_packet_staged(nodes, tris, org, dirn, tnear, tfar,
                            bbox_lo, bbox_hi, max_leaf: int = 64,
                            interpret: bool = False, hbm: bool = False,
                            use_cull: bool = True,
                            stages=(0.07, 0.3)) -> Hit:
    """Exact closest-hit: octant/Morton sort once, then staged-t segment
    traversal (see block comment).  stages are fractions of the scene
    diagonal; a final uncapped stage always runs."""
    caps = _staged_caps(bbox_lo, bbox_hi, stages) + [None]

    def run(o, d, tn, tf):
        best = Hit(jnp.full_like(tn, INF),
                   jnp.full(tn.shape, -1, jnp.int32),
                   jnp.zeros_like(tn), jnp.zeros_like(tn))
        lo_t = tn
        for cap in caps:
            live = (best.tri < 0) & (tf > lo_t)
            tf_k = jnp.where(
                live, tf if cap is None else jnp.minimum(tf, cap), -1.0)
            h = intersect_packet(nodes, tris, o, d, lo_t, tf_k,
                                 max_leaf=max_leaf, interpret=interpret,
                                 hbm=hbm, use_cull=use_cull)
            upd = live & (h.tri >= 0)
            best = Hit(jnp.where(upd, h.t, best.t),
                       jnp.where(upd, h.tri, best.tri),
                       jnp.where(upd, h.u, best.u),
                       jnp.where(upd, h.v, best.v))
            if cap is not None:
                # overlap the boundary slightly so a hit exactly at the
                # cap cannot fall between stages
                lo_t = jnp.where(live, cap * (1.0 - 1e-5), lo_t)
        return best.t, best.tri, best.u, best.v

    t, tri, u, v = _sorted_call(run, 4, org, dirn, tnear, tfar,
                                bbox_lo, bbox_hi)
    return Hit(t, tri, u, v)


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull',
                                   'stages'))
def occluded_packet_staged(nodes, tris, org, dirn, tnear, tfar,
                           bbox_lo, bbox_hi, max_leaf: int = 64,
                           interpret: bool = False, hbm: bool = False,
                           use_cull: bool = True,
                           stages=(0.07, 0.3)):
    """Exact any-hit via staged-t segments: blockers are usually near the
    shaded point, so stage 1 resolves most occluded rays with a tiny
    union, and resolved rays go dead for later stages."""
    caps = _staged_caps(bbox_lo, bbox_hi, stages) + [None]

    def run(o, d, tn, tf):
        occ = jnp.zeros(tn.shape, bool)
        lo_t = tn
        for cap in caps:
            live = ~occ & (tf > lo_t)
            tf_k = jnp.where(
                live, tf if cap is None else jnp.minimum(tf, cap), -1.0)
            occ = occ | occluded_packet(nodes, tris, o, d, lo_t, tf_k,
                                        max_leaf=max_leaf,
                                        interpret=interpret, hbm=hbm,
                                        use_cull=use_cull)
            if cap is not None:
                lo_t = jnp.where(live, cap * (1.0 - 1e-5), lo_t)
        return occ

    return _sorted_call(run, 1, org, dirn, tnear, tfar, bbox_lo, bbox_hi)


# ---------------------------------------------------------------------------
# Treelet-binned wavefront traversal.
#
# Sorted shared-stack packets cap out at ~1.5-2 Mrps for bounce>=1 rays:
# 1024 incoherent rays' node-visit UNION spans most of the tree no matter
# how they are key-sorted (measured: octant/Morton key variants all land
# within 10%).  The fix is structural — assign each ray to its nearest
# candidate *treelet* (a subtree from treelet_cut), group rays by treelet
# (segment-padded so every packet has ONE treelet), and traverse each
# packet from its treelet root.  A packet then only walks a ~1/T slice of
# the tree, restoring the union locality that makes coherent packets
# fast.  Remaining candidate treelets (entry distance < running t_best)
# are handled by further rounds and a final bounded fallback pass, so
# results are exact — bit-identical to intersect_packet.
#
# This is the TPU analog of ray-stream/treelet schedulers (Embree's
# rtcIntersect1M stream mode; the reference's single-ray recursion never
# needed it because a CPU core has no 1024-wide SIMD to keep coherent).
# ---------------------------------------------------------------------------


def _mask_words(n_treelets: int) -> int:
    return (n_treelets + 31) // 32


def _mark_processed(processed, sel, has):
    """Set bit `sel` in the (R, W) uint32 visited-treelet mask."""
    w = processed.shape[1]
    word = jnp.clip(sel, 0, 32 * w - 1) // 32
    bit = jnp.uint32(1) << (jnp.clip(sel, 0, 32 * w - 1) % 32
                            ).astype(jnp.uint32)
    upd = jnp.where(has[:, None] & (word[:, None] == jnp.arange(w)),
                    bit[:, None], jnp.uint32(0))
    return processed | upd


def _treelet_assign(boxes, org, dirn, tnear, tfar, processed):
    """Nearest unprocessed candidate treelet per ray.

    boxes: (T, 6) [lo|hi]; processed: (R, W) uint32 bitmask of visited
    treelets (W = ceil(T/32)).  Returns (sel (R,) i32, has (R,) bool):
    the treelet with the smallest slab entry distance among {unprocessed,
    entered before tfar}.  Python-unrolled over T (static, <= 128) so no
    (R, T) temporary materializes."""
    inv = 1.0 / jnp.where(jnp.abs(dirn) > 1e-30, dirn,
                          jnp.where(dirn >= 0, 1e-30, -1e-30))
    best_t = jnp.full(org.shape[:1], INF)
    sel = jnp.full(org.shape[:1], -1, jnp.int32)
    for t in range(boxes.shape[0]):
        t0 = (boxes[t, 0:3] - org) * inv
        t1 = (boxes[t, 3:6] - org) * inv
        tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), tnear)
        tmax = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), tfar)
        ok = ((tmin <= tmax)
              & ((processed[:, t // 32] & jnp.uint32(1 << (t % 32))) == 0)
              & (tmin < best_t))
        best_t = jnp.where(ok, tmin, best_t)
        sel = jnp.where(ok, t, sel)
    return sel, sel >= 0


def _binned_layout(sel, has, org, dirn, tnear, tfar, n_treelets: int,
                   bbox_lo, bbox_hi, block: int = BLOCK,
                   align: int = 1):
    """Group rays by treelet/cell into block-aligned segments.

    Returns (slot, org_p, dirn_p, tn_p, tf_p, seg_offs): slot (R,) maps
    each ORIGINAL ray to its position in the packed _p arrays (slot ==
    cap for rays this round does not process); the _p arrays have static
    capacity R + T*block, rounded up to `align`; padding lanes carry
    tfar=-1 (the kernels' dead marker).  Within a segment rays keep
    octant/Morton order (the intra-segment coherence key).

    Deliberately scatter-free: general scatters (slots with gaps) take
    XLA's serialized TPU path (~6 ms per array at 1M rays, measured by
    scripts/profile_grid.py); everything here is argsort + searchsorted
    + gathers, which all run at memory speed."""
    r = sel.shape[0]
    t_cnt = n_treelets
    cap = r + t_cnt * block
    cap = (cap + align - 1) // align * align
    key = _ray_sort_key(org, dirn, jnp.asarray(bbox_lo),
                        jnp.asarray(bbox_hi))
    k = (jnp.where(has, sel.astype(jnp.uint32), jnp.uint32(t_cnt))
         << jnp.uint32(18)) | (key & jnp.uint32(0x3FFFF))
    perm = jnp.argsort(k)
    sel_s = sel[perm]
    has_s = has[perm]
    # per-segment counts from the sorted segment column (no bincount —
    # bincount is a scatter-add)
    cells_sorted = jnp.where(has_s, sel_s, t_cnt).astype(jnp.int32)
    bounds = jnp.searchsorted(cells_sorted,
                              jnp.arange(t_cnt + 1, dtype=jnp.int32))
    cnt = bounds[1:] - bounds[:-1]
    pad_cnt = (cnt + block - 1) // block * block
    seg_offs = jnp.concatenate([jnp.zeros((1,), cnt.dtype),
                                jnp.cumsum(pad_cnt)])
    sel_c = jnp.clip(sel_s, 0, t_cnt - 1)
    rank = jnp.arange(r) - bounds[sel_c]
    # nondecreasing in sorted order (segments ascend, ranks ascend)
    slot_sorted = jnp.where(has_s, seg_offs[sel_c] + rank, cap)

    # packed arrays by gather: position p's source is the unique sorted
    # ray with slot_sorted == p (binary search over the sorted slots)
    pos = jnp.arange(cap, dtype=slot_sorted.dtype)
    j = jnp.clip(jnp.searchsorted(slot_sorted, pos), 0, r - 1)
    occupied = slot_sorted[j] == pos
    src = perm[j]

    def gath(x, fill):
        full = x[src]
        fillv = jnp.asarray(fill, x.dtype)
        if x.ndim > 1:
            return jnp.where(occupied[:, None], full, fillv)
        return jnp.where(occupied, full, fillv)

    org_p = gath(org, 0.0)
    dirn_p = gath(dirn, 1.0)
    tn_p = gath(tnear, 0.0)
    tf_p = gath(tfar, -1.0)              # padding lanes are dead
    # slot in ORIGINAL ray order (inverse of perm, gather-only)
    inv = jnp.argsort(perm)
    slot = slot_sorted[inv]
    return slot, org_p, dirn_p, tn_p, tf_p, seg_offs


def _packet_roots(seg_offs, roots, cap: int):
    """Treelet root per BLOCK packet from the segment offsets."""
    starts = jnp.arange(0, cap, BLOCK)
    tid = jnp.clip(jnp.searchsorted(seg_offs[1:], starts, side='right'),
                   0, roots.shape[0] - 1)
    return roots[tid]


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull',
                                   'rounds'))
def intersect_packet_binned(nodes, tris, troots, tboxes, org, dirn,
                            tnear, tfar, bbox_lo, bbox_hi,
                            max_leaf: int = 64, interpret: bool = False,
                            hbm: bool = False, use_cull: bool = True,
                            rounds: int = 2) -> Hit:
    """Exact closest-hit via treelet-binned rounds + bounded fallback.

    troots/tboxes from treelet_cut.  Each round: every live ray visits its
    nearest remaining candidate treelet (entry distance < running best t),
    grouped so each packet traverses ONE treelet.  Rays whose candidates
    are exhausted go inactive; whatever still has candidates after the
    static `rounds` is finished by one global-root pass bounded by the
    running best t (cheap: pop culling sees a tight t from the start)."""
    r = org.shape[0]
    t_cnt = troots.shape[0]
    cap = r + t_cnt * BLOCK
    processed = jnp.zeros((r, _mask_words(t_cnt)), jnp.uint32)
    best = Hit(jnp.full((r,), INF), jnp.full((r,), -1, jnp.int32),
               jnp.zeros((r,)), jnp.zeros((r,)))

    for _ in range(rounds):
        bound = jnp.minimum(tfar, best.t)
        sel, has = _treelet_assign(tboxes, org, dirn, tnear, bound,
                                   processed)
        processed = _mark_processed(processed, sel, has)
        slot, org_p, dirn_p, tn_p, tf_p, seg_offs = _binned_layout(
            sel, has, org, dirn, tnear, bound, t_cnt, bbox_lo, bbox_hi)
        roots = _packet_roots(seg_offs, troots, cap)
        h = intersect_packet(nodes, tris, org_p, dirn_p, tn_p, tf_p,
                             roots=roots, max_leaf=max_leaf,
                             interpret=interpret, hbm=hbm,
                             use_cull=use_cull)
        # slot is in original ray order: results come back by gather
        take = jnp.minimum(slot, cap - 1)
        t_o = jnp.where(slot < cap, h.t[take], INF)
        tri_o = jnp.where(slot < cap, h.tri[take], -1)
        u_o = jnp.where(slot < cap, h.u[take], 0.0)
        v_o = jnp.where(slot < cap, h.v[take], 0.0)
        better = t_o < best.t
        best = Hit(jnp.where(better, t_o, best.t),
                   jnp.where(better, tri_o, best.tri),
                   jnp.where(better, u_o, best.u),
                   jnp.where(better, v_o, best.v))

    # fallback: any ray still holding a candidate treelet finishes with a
    # global traversal bounded by its running best t
    bound = jnp.minimum(tfar, best.t)
    _, remaining = _treelet_assign(tboxes, org, dirn, tnear, bound,
                                   processed)
    tf_fb = jnp.where(remaining, bound, -1.0)
    h = intersect_packet_sorted(nodes, tris, org, dirn, tnear, tf_fb,
                                bbox_lo, bbox_hi, max_leaf=max_leaf,
                                interpret=interpret, hbm=hbm,
                                use_cull=use_cull)
    better = h.t < best.t
    best = Hit(jnp.where(better, h.t, best.t),
               jnp.where(better, h.tri, best.tri),
               jnp.where(better, h.u, best.u),
               jnp.where(better, h.v, best.v))
    return best


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull',
                                   'rounds'))
def occluded_packet_binned(nodes, tris, troots, tboxes, org, dirn,
                           tnear, tfar, bbox_lo, bbox_hi,
                           max_leaf: int = 64, interpret: bool = False,
                           hbm: bool = False, use_cull: bool = True,
                           rounds: int = 2):
    """Exact any-hit via treelet-binned rounds + bounded fallback."""
    r = org.shape[0]
    t_cnt = troots.shape[0]
    cap = r + t_cnt * BLOCK
    processed = jnp.zeros((r, _mask_words(t_cnt)), jnp.uint32)
    occ = jnp.zeros((r,), bool)

    for _ in range(rounds):
        live_tf = jnp.where(occ, -1.0, tfar)
        sel, has = _treelet_assign(tboxes, org, dirn, tnear, live_tf,
                                   processed)
        processed = _mark_processed(processed, sel, has)
        slot, org_p, dirn_p, tn_p, tf_p, seg_offs = _binned_layout(
            sel, has, org, dirn, tnear, live_tf, t_cnt, bbox_lo, bbox_hi)
        roots = _packet_roots(seg_offs, troots, cap)
        o = occluded_packet(nodes, tris, org_p, dirn_p, tn_p, tf_p,
                            roots=roots, max_leaf=max_leaf,
                            interpret=interpret, hbm=hbm,
                            use_cull=use_cull)
        take = jnp.minimum(slot, cap - 1)
        occ = occ | jnp.where(slot < cap, o[take], False)

    live_tf = jnp.where(occ, -1.0, tfar)
    _, remaining = _treelet_assign(tboxes, org, dirn, tnear, live_tf,
                                   processed)
    tf_fb = jnp.where(remaining, live_tf, -1.0)
    occ = occ | occluded_packet_sorted(nodes, tris, org, dirn, tnear,
                                       tf_fb, bbox_lo, bbox_hi,
                                       max_leaf=max_leaf,
                                       interpret=interpret, hbm=hbm,
                                       use_cull=use_cull)
    return occ


# ---------------------------------------------------------------------------
# Treelet-binned DENSE wavefront traversal — the incoherent-ray fast path.
#
# Profiling (scripts/profile_phases.py, 92k-tri colonnade on v5e) showed
# incoherent sorted packets are limited by the leaf-union problem: 1024
# omnidirectional rays share one traversal, so every packet tests ~35x
# more triangle rows than any single ray needs, and the stack kernel's
# row-broadcast layout caps pair-test throughput at ~15-20 Gpairs/s.
# Grouping tricks (treelet-rooted stack packets, staged-t, light-seg
# keys) all measured neutral-or-worse because the underlying pair rate
# is the bound.
#
# This path changes the bound instead of the grouping: rays are binned
# to their nearest candidate treelet (as above), and each 64-ray program
# DENSELY sweeps its treelet's contiguous triangle-tile range with the
# outer-product pairs kernel (ops/pallas_pairs.py, rays-in-sublanes x
# tris-in-lanes — ~4-6x the pair rate).  No stack, no divergence, no
# shuffles: a treelet of ~1-2k triangles costs what the stack kernel
# paid in waste anyway, at a far higher sustained rate.  Rounds +
# bounded global fallback keep it exact (bit-identical to
# intersect_packet), same as the packet-binned variant above.
# ---------------------------------------------------------------------------


def _dense_ranges(seg_offs, tgs, tge, cap: int, block: int):
    """Per-program [gs, ge) tri-tile range from the segment offsets.
    Programs past the last segment (dump/padding region) get an empty
    range."""
    starts = jnp.arange(0, cap, block)
    tid = jnp.clip(jnp.searchsorted(seg_offs[1:], starts, side='right'),
                   0, tgs.shape[0] - 1)
    inside = starts < seg_offs[-1]
    gs = jnp.where(inside, tgs[tid], 0)
    ge = jnp.where(inside, tge[tid], 0)
    return gs.astype(jnp.int32), ge.astype(jnp.int32)


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull',
                                   'rounds', 'rt'))
def intersect_dense_binned(nodes, tris, planes, rows, tboxes, tgs, tge,
                           org, dirn, tnear, tfar, bbox_lo, bbox_hi,
                           max_leaf: int = 64, interpret: bool = False,
                           hbm: bool = False, use_cull: bool = True,
                           rounds: int = 2, rt: int = 8) -> Hit:
    """Exact closest-hit: treelet-binned dense sweeps + bounded fallback.

    planes/rows from pallas_pairs.pack_planes; tgs/tge from
    treelet_tri_tiles; nodes/tris feed the stack-kernel fallback pass."""
    from . import pallas_pairs as ppp
    r = org.shape[0]
    t_cnt = tboxes.shape[0]
    block = ppp.RB * rt
    cap = r + t_cnt * block
    cap = (cap + block * 8 - 1) // (block * 8) * (block * 8)
    processed = jnp.zeros((r, _mask_words(t_cnt)), jnp.uint32)
    best = Hit(jnp.full((r,), INF), jnp.full((r,), -1, jnp.int32),
               jnp.zeros((r,)), jnp.zeros((r,)))

    for _ in range(rounds):
        bound = jnp.minimum(tfar, best.t)
        sel, has = _treelet_assign(tboxes, org, dirn, tnear, bound,
                                   processed)
        processed = _mark_processed(processed, sel, has)
        slot, org_p, dirn_p, tn_p, tf_p, seg_offs = _binned_layout(
            sel, has, org, dirn, tnear, bound, t_cnt, bbox_lo, bbox_hi,
            block=block, align=block * 8)
        gs, ge = _dense_ranges(seg_offs, tgs, tge, cap, block)
        t_p, tri_p = ppp.intersect_pairs_raw(
            planes, org_p, dirn_p, tn_p, tf_p, gs=gs, ge=ge, rt=rt,
            use_cull=use_cull, interpret=interpret)
        take = jnp.minimum(slot, cap - 1)
        t_o = jnp.where(slot < cap, t_p[take], INF)
        tri_o = jnp.where(slot < cap, tri_p[take], -1)
        better = t_o < best.t
        best = Hit(jnp.where(better, t_o, best.t),
                   jnp.where(better, tri_o, best.tri), best.u, best.v)

    bound = jnp.minimum(tfar, best.t)
    _, remaining = _treelet_assign(tboxes, org, dirn, tnear, bound,
                                   processed)
    tf_fb = jnp.where(remaining, bound, -1.0)
    h = intersect_packet_sorted(nodes, tris, org, dirn, tnear, tf_fb,
                                bbox_lo, bbox_hi, max_leaf=max_leaf,
                                interpret=interpret, hbm=hbm,
                                use_cull=use_cull)
    better = h.t < best.t
    t = jnp.where(better, h.t, best.t)
    tri = jnp.where(better, h.tri, best.tri)
    # u/v once, for the final winner (cheaper than carrying them
    # through every round)
    u, v = ppp.recompute_uv(rows, org, dirn, t, tri)
    return Hit(t, tri, u, v)


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull',
                                   'rounds', 'rt'))
def occluded_dense_binned(nodes, tris, planes, tboxes, tgs, tge,
                          org, dirn, tnear, tfar, bbox_lo, bbox_hi,
                          max_leaf: int = 64, interpret: bool = False,
                          hbm: bool = False, use_cull: bool = True,
                          rounds: int = 2, rt: int = 8):
    """Exact any-hit: treelet-binned dense sweeps + bounded fallback."""
    from . import pallas_pairs as ppp
    r = org.shape[0]
    t_cnt = tboxes.shape[0]
    block = ppp.RB * rt
    cap = r + t_cnt * block
    cap = (cap + block * 8 - 1) // (block * 8) * (block * 8)
    processed = jnp.zeros((r, _mask_words(t_cnt)), jnp.uint32)
    occ = jnp.zeros((r,), bool)

    for _ in range(rounds):
        live_tf = jnp.where(occ, -1.0, tfar)
        sel, has = _treelet_assign(tboxes, org, dirn, tnear, live_tf,
                                   processed)
        processed = _mark_processed(processed, sel, has)
        slot, org_p, dirn_p, tn_p, tf_p, seg_offs = _binned_layout(
            sel, has, org, dirn, tnear, live_tf, t_cnt, bbox_lo, bbox_hi,
            block=block, align=block * 8)
        gs, ge = _dense_ranges(seg_offs, tgs, tge, cap, block)
        o = ppp.occluded_pairs(planes, org_p, dirn_p, tn_p, tf_p,
                               gs=gs, ge=ge, rt=rt, use_cull=use_cull,
                               interpret=interpret)
        take = jnp.minimum(slot, cap - 1)
        occ = occ | jnp.where(slot < cap, o[take], False)

    live_tf = jnp.where(occ, -1.0, tfar)
    _, remaining = _treelet_assign(tboxes, org, dirn, tnear, live_tf,
                                   processed)
    tf_fb = jnp.where(remaining, live_tf, -1.0)
    occ = occ | occluded_packet_sorted(nodes, tris, org, dirn, tnear,
                                       tf_fb, bbox_lo, bbox_hi,
                                       max_leaf=max_leaf,
                                       interpret=interpret, hbm=hbm,
                                       use_cull=use_cull)
    return occ


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
          & (uh >= -BARY_EPS) & (vh >= -BARY_EPS) & (uh + vh <= 1.0 + BARY_EPS)
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
