"""4-wide (BVH4) Pallas packet traversal — the round-4 wide-node
ablation (VERDICT r3 item 2; reference analog: Embree's BVH4, the
`-accel bvh4` family named by the .ecs language, renderer.cpp -rtcore
parsing).

Motivation, from the measured binary-kernel counts (colonnade, leaf 32,
sorted bounce-1): 1604 pops/packet at ~0.25 us each are scalar
stack/branch traffic comparable in total to the tri-row vector work.
A 4-wide node tests 4 child boxes per pop (2 binary levels at once),
processes leaf slots INLINE (leaves never enter the stack), and pushes
only interior children — so pops fall to roughly the binary count / 3
and the scalar overhead with them, while total slab vector work stays
the same (every box is still tested exactly once).

Node encoding (`pack_nodes4`): (N4, 32) f32 rows, 4 slots of 8:
  slot k floats [8k .. 8k+8) = [lo.x lo.y lo.z hi.x hi.y hi.z  A  tag]
  tag  > 0: leaf slot, count = tag, A = first packed triangle
  tag == -1: interior slot, A = 4-wide child node index
  tag ==  0: empty slot — excluded by the tag!=0 push guard; the
             +inf/-inf box is DON'T-CARE (with the min/max slab
             formulation an inverted box still "hits": tmin=tnear <=
             tmax, so the box values alone must never be relied on)
SMEM cost is identical to the binary layout: ~N/4 wide nodes x 32 f32
vs N x 8 f32 (binary leaf nodes disappear into parent slots).

Traversal order: interior children are pushed far-to-near by their
packet-min slab entry distance through a 4-element sort network (the
binary kernel's split-axis heuristic doesn't extend to 4 slots); pop
culling against the packet-max best-t is unchanged.

Triangles use the same (G, 128) packed rows and `_leaf_groups` test as
the binary kernel, HBM streaming included.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, BARY_EPS
from .pallas_traverse import (BLOCK, STACK, _leaf_groups, _vec_spec,
                              _hbm_window)

INF = float(np.inf)


def _check_packed(out: np.ndarray, width: int) -> np.ndarray:
    """Host-side safety checks on a packed wide-node table:

    * wide-node indices and leaf (start+count) ranges must be exactly
      representable in f32 (the rows store them as floats; SBVH
      duplication can inflate packed triangle refs past the input
      count, so the leaf bound is checked on the packed values);
    * worst-case stack occupancy: each interior pop can push up to
      `width` entries (leaves ride the stack too), so a wide tree of
      depth D can occupy (width-1)*D + 1 slots — assert that fits the
      kernels' SMEM STACK before a deep/unbalanced tree (e.g.
      quality='high-spatial' SBVH) could silently overrun it.
    """
    tags = out.reshape(-1, width, 8)[:, :, 7]
    a = out.reshape(-1, width, 8)[:, :, 6]
    assert out.shape[0] < (1 << 24), "wide node index exceeds f32 exact"
    leaf = tags > 0
    if np.any(leaf):
        assert float(np.max(a[leaf] + tags[leaf])) < float(1 << 24), \
            "leaf triangle range exceeds f32-exact 2^24"
    # BFS depth of the wide tree (rows are emitted root-first but not
    # strictly level-ordered; walk the child links)
    children = [[] for _ in range(out.shape[0])]
    interior = tags < 0
    for w in range(out.shape[0]):
        for k in range(width):
            if interior[w, k]:
                children[w].append(int(a[w, k]))
    depth = 1
    frontier = [0]
    seen = 0
    while frontier:
        seen += len(frontier)
        nxt = [c for w in frontier for c in children[w]]
        if nxt:
            depth += 1
        frontier = nxt
    worst = (width - 1) * depth + 1
    assert worst <= STACK, (
        f"wide tree depth {depth} could occupy {worst} stack slots "
        f"(> STACK={STACK}); rebuild with a shallower/balanced tree")
    return out


def pack_nodes4(bvh) -> np.ndarray:
    """Collapse a binary FlatBVH (skip-pointer layout) into (N4, 32) f32
    4-wide rows (see module docstring).  Pure host numpy."""
    lo, hi = bvh.lo, bvh.hi
    start, count, skip = bvh.start, bvh.count, bvh.skip
    interior = count == 0
    n = bvh.num_nodes

    def children(b):
        l = b + 1
        return l, int(skip[l])

    def slot_of(b):
        """(lo, hi, A, tag) for binary node b as a slot."""
        if interior[b]:
            return (lo[b], hi[b], b, -1.0)       # A patched to wide id
        return (lo[b], hi[b], float(start[b]), float(count[b]))

    rows = []
    wide_of = {}            # binary interior node -> wide row index
    pending = []            # (wide_row, slot_k, binary_interior_node)

    def emit(b):
        """Emit the wide node for binary interior node b (or a leaf
        root).  Slots = children, with interior children expanded one
        more level when there is room."""
        slots = []
        if not interior[b]:
            slots = [slot_of(b)]
        else:
            for c in children(b):
                if interior[c]:
                    slots.extend(slot_of(g) for g in children(c))
                else:
                    slots.append(slot_of(c))
        row = np.zeros(32, np.float32)
        me = len(rows)
        rows.append(row)
        for k, (slo, shi, a, tag) in enumerate(slots):
            row[8 * k:8 * k + 3] = slo
            row[8 * k + 3:8 * k + 6] = shi
            row[8 * k + 7] = tag
            if tag < 0:
                pending.append((me, k, int(a)))
            else:
                row[8 * k + 6] = a
        for k in range(len(slots), 4):
            # empty slot: excluded by tag==0 (box values are don't-care)
            row[8 * k + 0:8 * k + 3] = INF
            row[8 * k + 3:8 * k + 6] = -INF
            row[8 * k + 7] = 0.0
        return me

    wide_of[0] = emit(0)
    i = 0
    while i < len(pending):
        w, k, b = pending[i]
        i += 1
        if b not in wide_of:
            wide_of[b] = emit(b)
        rows[w][8 * k + 6] = float(wide_of[b])
    return _check_packed(np.stack(rows).astype(np.float32), 4)


def pack_nodes8(bvh) -> np.ndarray:
    """Collapse a binary FlatBVH into (N8, 64) f32 8-wide rows (the BVH8
    half of VERDICT r3 item 2; Embree analog: BVH8/AVX).  Slot encoding
    as pack_nodes4.  Slots are filled BFS-greedily: a wide node starts
    as the binary node's two children and repeatedly replaces the
    interior slot with the LARGEST surface area by its two children
    while <= 8 slots remain — deeper collapse than pack_nodes4's fixed
    two-level expansion, so unbalanced subtrees still fill rows."""
    lo, hi = bvh.lo, bvh.hi
    start, count, skip = bvh.start, bvh.count, bvh.skip
    interior = count == 0

    def children(b):
        l = b + 1
        return l, int(skip[l])

    def area(b):
        d = np.maximum(hi[b] - lo[b], 0.0)
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    rows = []
    wide_of = {}
    pending = []

    def emit(b):
        if not interior[b]:
            slots = [b]
        else:
            slots = list(children(b))
            while len(slots) < 8:
                cand = [s for s in slots if interior[s]]
                if not cand:
                    break
                s = max(cand, key=area)
                i = slots.index(s)
                slots[i:i + 1] = list(children(s))
        row = np.zeros(64, np.float32)
        me = len(rows)
        rows.append(row)
        for k, s in enumerate(slots):
            row[8 * k:8 * k + 3] = lo[s]
            row[8 * k + 3:8 * k + 6] = hi[s]
            if interior[s]:
                row[8 * k + 7] = -1.0
                pending.append((me, k, s))
            else:
                row[8 * k + 6] = float(start[s])
                row[8 * k + 7] = float(count[s])
        for k in range(len(slots), 8):
            # empty slot: excluded by tag==0 (box values are don't-care)
            row[8 * k + 0:8 * k + 3] = INF
            row[8 * k + 3:8 * k + 6] = -INF
            row[8 * k + 7] = 0.0
        return me

    wide_of[0] = emit(0)
    i = 0
    while i < len(pending):
        w, k, b = pending[i]
        i += 1
        if b not in wide_of:
            wide_of[b] = emit(b)
        rows[w][8 * k + 6] = float(wide_of[b])
    return _check_packed(np.stack(rows).astype(np.float32), 8)


# descending-order sort networks (compare-exchange pairs); 4 = odd-even
# transposition (5 CE), 8 = Batcher odd-even merge (19 CE)
_SORT_NETS = {
    4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
    8: ((0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6),
        (0, 4), (1, 5), (2, 6), (3, 7),
        (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)),
}


def _sort4(m, a, c, has):
    """Descending-by-m sort network over W (m, a, c, has) scalar tuples
    (far-first push order).  Misses get m=-inf so they sort last;
    their pushes are skipped by `has` either way."""
    m = [jnp.where(h, v, jnp.float32(-INF)) for v, h in zip(m, has)]

    def swap(i, j, ls):
        # after: element i has the LARGER m (far first)
        lt = ls[0][i] < ls[0][j]
        out = []
        for l in ls:
            li = jnp.where(lt, l[j], l[i])
            lj = jnp.where(lt, l[i], l[j])
            l = list(l)
            l[i], l[j] = li, lj
            out.append(l)
        return out

    ls = [m, a, c, has]
    for i, j in _SORT_NETS[len(m)]:
        ls = swap(i, j, ls)
    return ls


def _kernel4(nodes_ref, tris_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tn_ref, tf_ref,
             t_out, tri_out, u_out, v_out,
             stack_ref, stackt_ref, stackc_ref, tri_scratch, dma_sem,
             max_leaf: int, hbm: bool, use_cull: bool,
             width: int = 4, counts_out=None):
    """v2 kernel: stack entries are (payload, tmin, count) — count > 0
    marks a LEAF entry (payload = first triangle), count == 0 an
    interior wide node (payload = wide node index).  Leaves ride the
    stack so (a) leaf processing is globally near-first ORDERED, and
    (b) interior expansion carries only scalars through its branch —
    the v1 design processed leaf slots inline and paid 4 vector-carried
    lax.cond branches per pop (measured: pops fell 1604 -> 482 but
    per-pop cost tripled; v1 bounce-1 1.10 vs binary 1.00 Mrps, and
    coherent LOST 49 -> 38 Mrps)."""
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

    def slab(base, t_b):
        t0x = (nodes_ref[base + 0] - ox) * ix
        t1x = (nodes_ref[base + 3] - ox) * ix
        t0y = (nodes_ref[base + 1] - oy) * iy
        t1y = (nodes_ref[base + 4] - oy) * iy
        t0z = (nodes_ref[base + 2] - oz) * iz
        t1z = (nodes_ref[base + 5] - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), tnear))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), t_b))
        hit = tmin <= tmax
        return jnp.any(hit), jnp.min(jnp.where(hit, tmin, INF))

    stack_ref[0] = 0
    stackt_ref[0] = 0.0
    stackc_ref[0] = 0

    def cond(state):
        return state[0] >= 0

    def body(state):
        if counts_out is None:
            sp, t_best, tri_best, u_best, v_best, t_allmax = state
            cnt = None
        else:
            sp, t_best, tri_best, u_best, v_best, t_allmax, cnt = state
        payload = stack_ref[sp]
        tpop = stackt_ref[sp]
        ecount = stackc_ref[sp]
        sp = sp - 1

        def process(carry):
            if counts_out is None:
                sp, t_best, tri_best, u_best, v_best, t_allmax = carry
                cnt = None
            else:
                sp, t_best, tri_best, u_best, v_best, t_allmax, cnt = carry
            base0 = 8 * width * payload
            is_leaf = ecount > 0

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
                      & (uh >= -BARY_EPS) & (vh >= -BARY_EPS)
                      & (uh + vh <= 1.0 + BARY_EPS)
                      & (th > tnear) & (th < t_b))
                if use_cull:
                    ngd = dx * w[12] + dy * w[13] + dz * w[14]
                    ok = ok & ((w[15] != 1.0) | (ngd < 0.0))
                return (jnp.where(ok, th, t_b),
                        jnp.where(ok, tri_index, tri_b),
                        jnp.where(ok, uh, u_b),
                        jnp.where(ok, vh, v_b))

            def do_leaf(c):
                t_b, tri_b, u_b, v_b = c
                t_b, tri_b, u_b, v_b = _leaf_groups(
                    tris_ref, payload, ecount, max_leaf, tri_test,
                    (t_b, tri_b, u_b, v_b),
                    tri_scratch if hbm else None,
                    dma_sem if hbm else None)
                return t_b, tri_b, u_b, v_b

            # leaf entries mutate the vector bests; interior entries
            # expand with a scalar-only carry (no vector copies)
            t_best, tri_best, u_best, v_best = jax.lax.cond(
                is_leaf, do_leaf, lambda c: c,
                (t_best, tri_best, u_best, v_best))
            t_allmax = jax.lax.cond(is_leaf,
                                    lambda _: jnp.max(t_best),
                                    lambda ta: ta, t_allmax)
            if cnt is not None:
                rows = jnp.where(
                    is_leaf,
                    (payload + ecount + 7) // 8 - payload // 8, 0)
                cnt = (cnt[0], cnt[1],
                       cnt[2] + is_leaf.astype(jnp.int32),
                       cnt[3] + rows)

            def do_expand(_):
                ms, as_, cs, has = [], [], [], []
                for k in range(width):
                    base = base0 + 8 * k
                    a = nodes_ref[base + 6].astype(jnp.int32)
                    tag = nodes_ref[base + 7].astype(jnp.int32)
                    any_k, m_k = slab(base, t_best)
                    ms.append(m_k)
                    as_.append(a)
                    cs.append(jnp.maximum(tag, 0))
                    has.append(any_k & (tag != 0))
                return tuple(ms + as_ + cs + has)

            def skip_expand(_):
                z = jnp.float32(0.0)
                zi = jnp.int32(0)
                f = jnp.bool_(False)
                return ((z,) * width + (zi,) * (2 * width)
                        + (f,) * width)

            ex = jax.lax.cond(is_leaf, skip_expand, do_expand, 0)
            ms, as_, cs, has = (list(ex[0:width]),
                                list(ex[width:2 * width]),
                                list(ex[2 * width:3 * width]),
                                list(ex[3 * width:4 * width]))

            # push surviving slots far-to-near (leaves and interiors
            # share the ordered stack)
            ms, as_, cs, has = _sort4(ms, as_, cs, has)
            for k in range(width):
                spk = sp + has[k].astype(jnp.int32)

                @pl.when(has[k])
                def _(spk=spk, k=k):
                    stack_ref[spk] = as_[k]
                    stackt_ref[spk] = ms[k]
                    stackc_ref[spk] = cs[k]
                sp = spk

            if cnt is None:
                return sp, t_best, tri_best, u_best, v_best, t_allmax
            return sp, t_best, tri_best, u_best, v_best, t_allmax, cnt

        live = tpop <= t_allmax
        if counts_out is not None:
            cnt = (cnt[0] + 1,
                   cnt[1] + 1 - live.astype(jnp.int32), cnt[2], cnt[3])
            carry = (sp, t_best, tri_best, u_best, v_best, t_allmax, cnt)
        else:
            carry = (sp, t_best, tri_best, u_best, v_best, t_allmax)
        return jax.lax.cond(live, process, lambda c: c, carry)

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
        pid = pl.program_id(0)
        counts_out[4 * pid + 0] = cnt[0]
        counts_out[4 * pid + 1] = cnt[1]
        counts_out[4 * pid + 2] = cnt[2]
        counts_out[4 * pid + 3] = cnt[3]
    t_out[:] = jnp.where(tri_best >= 0, t_best, INF)
    tri_out[:] = tri_best
    u_out[:] = u_best
    v_out[:] = v_best


@partial(jax.jit, static_argnames=('max_leaf', 'interpret', 'hbm',
                                   'use_cull', 'debug_counts', 'width'))
def intersect_packet4(nodes4, tris, org, dirn, tnear, tfar,
                      max_leaf: int = 64, interpret: bool = False,
                      hbm: bool = False, use_cull: bool = True,
                      debug_counts: bool = False, width: int = 4):
    """Closest-hit wide-node packet traversal.  nodes4: (Nw, 8*width)
    f32 (pack_nodes4 / pack_nodes8); everything else as
    intersect_packet."""
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)
    tri_space = pltpu.ANY if hbm else pltpu.VMEM

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=tri_space),
        _vec_spec(), _vec_spec(), _vec_spec(),
        _vec_spec(), _vec_spec(), _vec_spec(),
        _vec_spec(), _vec_spec(),
    ]
    args = [nodes4.reshape(-1), tris,
            org[:, 0], org[:, 1], org[:, 2],
            dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar]

    out_specs = [_vec_spec(), _vec_spec(), _vec_spec(), _vec_spec()]
    out_shape = [
        jax.ShapeDtypeStruct((r,), jnp.float32),
        jax.ShapeDtypeStruct((r,), jnp.int32),
        jax.ShapeDtypeStruct((r,), jnp.float32),
        jax.ShapeDtypeStruct((r,), jnp.float32),
    ]
    if debug_counts:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((r // BLOCK * 4,), jnp.int32))

    _k = partial(_kernel4, max_leaf=max_leaf, hbm=hbm, use_cull=use_cull,
                 width=width)

    def kernel(*refs):
        ins, rest = refs[:10], refs[10:]
        kw = {}
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
                        pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.VMEM((_hbm_window(max_leaf), 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(*args)
    t, tri, u, v = outs[:4]
    if debug_counts:
        return Hit(t, tri, u, v), outs[4].reshape(-1, 4)
    return Hit(t, tri, u, v)


def _kernel4_any(nodes_ref, tris_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 tn_ref, tf_ref, occ_out,
                 stack_ref, stackc_ref, tri_scratch, dma_sem,
                 max_leaf: int, hbm: bool, use_cull: bool,
                 width: int = 4):
    """Any-hit BVH4 (v2): stack entries (payload, count) — leaves ride
    the stack so each pop pays at most ONE vector-carried branch;
    subtrees pruned against the not-yet-occluded mask, whole-packet
    early exit (the wide analog of _kernel_any).  The v1 inline-leaf
    design paid 4 vector-carried conds per pop and LOST to the binary
    any-hit kernel (18.6 vs 23.3 Mrps, _wide_ab3.log)."""
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

    def slab_unocc(base, unocc):
        t0x = (nodes_ref[base + 0] - ox) * ix
        t1x = (nodes_ref[base + 3] - ox) * ix
        t0y = (nodes_ref[base + 1] - oy) * iy
        t1y = (nodes_ref[base + 4] - oy) * iy
        t0z = (nodes_ref[base + 2] - oz) * iz
        t1z = (nodes_ref[base + 5] - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), tnear))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z), tfar))
        return jnp.any((tmin <= tmax) & unocc)

    stack_ref[0] = 0
    stackc_ref[0] = 0

    def cond(state):
        sp, occ, done = state
        return (sp >= 0) & jnp.logical_not(done)

    def body(state):
        sp, occ, done = state
        payload = stack_ref[sp]
        ecount = stackc_ref[sp]
        sp = sp - 1
        base0 = 8 * width * payload
        is_leaf = ecount > 0
        unocc = occ == 0

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
                   & (uh >= -BARY_EPS) & (vh >= -BARY_EPS)
                   & (uh + vh <= 1.0 + BARY_EPS)
                   & (th > tnear) & (th < tfar))
            if use_cull:
                ngd = dx * w[12] + dy * w[13] + dz * w[14]
                hit = hit & ((w[15] != 1.0) | (ngd < 0.0))
            return jnp.maximum(occ, hit.astype(jnp.int32))

        def do_leaf(occ):
            return _leaf_groups(tris_ref, payload, ecount, max_leaf,
                                tri_test, occ,
                                tri_scratch if hbm else None,
                                dma_sem if hbm else None)

        occ = jax.lax.cond(is_leaf, do_leaf, lambda o: o, occ)
        done = jax.lax.cond(is_leaf, lambda _: jnp.all(occ > 0),
                            lambda d: d, done)
        unocc = occ == 0

        def do_expand(_):
            out = []
            for k in range(width):
                base = base0 + 8 * k
                a = nodes_ref[base + 6].astype(jnp.int32)
                tag = nodes_ref[base + 7].astype(jnp.int32)
                any_k = slab_unocc(base, unocc)
                out += [a, jnp.maximum(tag, 0),
                        (any_k & (tag != 0)).astype(jnp.int32)]
            return tuple(out)

        def skip_expand(_):
            z = jnp.int32(0)
            return (z,) * (3 * width)

        ex = jax.lax.cond(is_leaf, skip_expand, do_expand, 0)
        for k in range(width):
            push = ex[3 * k + 2] > 0
            spk = sp + push.astype(jnp.int32)

            @pl.when(push)
            def _(spk=spk, k=k):
                stack_ref[spk] = ex[3 * k]
                stackc_ref[spk] = ex[3 * k + 1]
            sp = spk

        return sp, occ, done

    dead = (tfar <= tnear).astype(jnp.int32)
    init = (jnp.int32(0), dead, jnp.bool_(False))
    _, occ, _ = jax.lax.while_loop(cond, body, init)
    occ_out[:] = occ * (1 - dead)


@partial(jax.jit, static_argnames=('max_leaf', 'interpret', 'hbm',
                                   'use_cull', 'width'))
def occluded_packet4(nodes4, tris, org, dirn, tnear, tfar,
                     max_leaf: int = 64, interpret: bool = False,
                     hbm: bool = False, use_cull: bool = True,
                     width: int = 4):
    """Any-hit wide-node packet traversal; contract of
    occluded_packet."""
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)
    tri_space = pltpu.ANY if hbm else pltpu.VMEM

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=tri_space),
        _vec_spec(), _vec_spec(), _vec_spec(),
        _vec_spec(), _vec_spec(), _vec_spec(),
        _vec_spec(), _vec_spec(),
    ]
    args = [nodes4.reshape(-1), tris,
            org[:, 0], org[:, 1], org[:, 2],
            dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar]

    occ = pl.pallas_call(
        partial(_kernel4_any, max_leaf=max_leaf, hbm=hbm,
                use_cull=use_cull, width=width),
        grid=grid,
        in_specs=in_specs,
        out_specs=[_vec_spec()],
        out_shape=[jax.ShapeDtypeStruct((r,), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.VMEM((_hbm_window(max_leaf), 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(*args)[0]
    return occ > 0


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull',
                                   'width'))
def intersect_packet4_sorted(nodes4, tris, org, dirn, tnear, tfar,
                             bbox_lo, bbox_hi, max_leaf: int = 64,
                             interpret: bool = False,
                             hbm: bool = False, use_cull: bool = True,
                             width: int = 4):
    """Closest-hit wide-node traversal with wavefront ray binning
    (pallas_traverse's _sorted_call octant/Morton order)."""
    from .pallas_traverse import _sorted_call

    def run(o, d, tn, tf):
        h = intersect_packet4(nodes4, tris, o, d, tn, tf,
                              max_leaf=max_leaf, interpret=interpret,
                              hbm=hbm, use_cull=use_cull, width=width)
        return (h.t, h.tri, h.u, h.v)

    t, tri, u, v = _sorted_call(run, 4, org, dirn, tnear, tfar,
                                bbox_lo, bbox_hi)
    return Hit(t, tri, u, v)


@partial(jax.jit, static_argnames=('bbox_lo', 'bbox_hi', 'max_leaf',
                                   'interpret', 'hbm', 'use_cull',
                                   'width'))
def occluded_packet4_sorted(nodes4, tris, org, dirn, tnear, tfar,
                            bbox_lo, bbox_hi, max_leaf: int = 64,
                            interpret: bool = False, hbm: bool = False,
                            use_cull: bool = True, seg=None, perm=None,
                            width: int = 4):
    """Any-hit wide-node traversal with wavefront ray binning; seg/perm
    as occluded_packet_sorted."""
    from .pallas_traverse import _sorted_call

    def run(o, d, tn, tf):
        return occluded_packet4(nodes4, tris, o, d, tn, tf,
                                max_leaf=max_leaf, interpret=interpret,
                                hbm=hbm, use_cull=use_cull, width=width)

    return _sorted_call(run, 1, org, dirn, tnear, tfar, bbox_lo, bbox_hi,
                        seg=seg, perm=perm)
