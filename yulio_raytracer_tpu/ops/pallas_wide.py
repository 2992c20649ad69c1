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
  tag ==  0: empty slot (boxes are +inf/-inf so slabs never hit)
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
            row[8 * k + 0:8 * k + 3] = INF      # empty: inverted box
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
    out = np.stack(rows).astype(np.float32)
    assert out.shape[0] < (1 << 24), "wide node index exceeds f32 exact"
    return out


def _sort4(m, a, has):
    """Descending-by-m sort network over 4 (m, a, has) scalar triples
    (far-first push order).  Misses get m=-inf so they sort last;
    their pushes are skipped by `has` either way."""
    m = [jnp.where(h, v, jnp.float32(-INF)) for v, h in zip(m, has)]

    def swap(i, j, m, a, has):
        # after: element i has the LARGER m (far first)
        lt = m[i] < m[j]
        mi = jnp.where(lt, m[j], m[i])
        mj = jnp.where(lt, m[i], m[j])
        ai = jnp.where(lt, a[j], a[i])
        aj = jnp.where(lt, a[i], a[j])
        hi_ = jnp.where(lt, has[j], has[i])
        hj = jnp.where(lt, has[i], has[j])
        m, a, has = list(m), list(a), list(has)
        m[i], m[j] = mi, mj
        a[i], a[j] = ai, aj
        has[i], has[j] = hi_, hj
        return m, a, has

    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        m, a, has = swap(i, j, m, a, has)
    return m, a, has


def _kernel4(nodes_ref, tris_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tn_ref, tf_ref,
             t_out, tri_out, u_out, v_out,
             stack_ref, stackt_ref, tri_scratch, dma_sem,
             max_leaf: int, hbm: bool, use_cull: bool,
             counts_out=None):
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

    def cond(state):
        return state[0] >= 0

    def body(state):
        if counts_out is None:
            sp, t_best, tri_best, u_best, v_best, t_allmax = state
            cnt = None
        else:
            sp, t_best, tri_best, u_best, v_best, t_allmax, cnt = state
        node = stack_ref[sp]
        tpop = stackt_ref[sp]
        sp = sp - 1

        def process(carry):
            if counts_out is None:
                sp, t_best, tri_best, u_best, v_best, t_allmax = carry
                cnt = None
            else:
                sp, t_best, tri_best, u_best, v_best, t_allmax, cnt = carry
            base0 = 32 * node

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

            ms, as_, has = [], [], []
            for k in range(4):
                base = base0 + 8 * k
                a = nodes_ref[base + 6].astype(jnp.int32)
                tag = nodes_ref[base + 7].astype(jnp.int32)
                any_k, m_k = slab(base, t_best)
                is_leaf = tag > 0
                if cnt is not None:
                    rows = jnp.where(is_leaf & any_k,
                                     (a + tag + 7) // 8 - a // 8, 0)
                    cnt = (cnt[0], cnt[1],
                           cnt[2] + (is_leaf & any_k).astype(jnp.int32),
                           cnt[3] + rows)

                def do_leaf(c):
                    t_b, tri_b, u_b, v_b = c
                    t_b, tri_b, u_b, v_b = _leaf_groups(
                        tris_ref, a, tag, max_leaf, tri_test,
                        (t_b, tri_b, u_b, v_b),
                        tri_scratch if hbm else None,
                        dma_sem if hbm else None)
                    return t_b, tri_b, u_b, v_b

                t_best, tri_best, u_best, v_best = jax.lax.cond(
                    is_leaf & any_k, do_leaf, lambda c: c,
                    (t_best, tri_best, u_best, v_best))
                ms.append(m_k)
                as_.append(a)
                has.append(any_k & (tag < 0))
            t_allmax = jnp.max(t_best)

            # push surviving interior children far-to-near
            ms, as_, has = _sort4(ms, as_, has)
            for k in range(4):
                spk = sp + has[k].astype(jnp.int32)

                @pl.when(has[k])
                def _(spk=spk, k=k):
                    stack_ref[spk] = as_[k]
                    stackt_ref[spk] = ms[k]
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
                                   'use_cull', 'debug_counts'))
def intersect_packet4(nodes4, tris, org, dirn, tnear, tfar,
                      max_leaf: int = 64, interpret: bool = False,
                      hbm: bool = False, use_cull: bool = True,
                      debug_counts: bool = False):
    """Closest-hit BVH4 packet traversal.  nodes4: (N4, 32) f32
    (pack_nodes4); everything else as intersect_packet."""
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

    _k = partial(_kernel4, max_leaf=max_leaf, hbm=hbm, use_cull=use_cull)

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
                        pltpu.VMEM((_hbm_window(max_leaf), 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(*args)
    t, tri, u, v = outs[:4]
    if debug_counts:
        return Hit(t, tri, u, v), outs[4].reshape(-1, 4)
    return Hit(t, tri, u, v)
