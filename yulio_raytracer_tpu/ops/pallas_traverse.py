"""Pallas packet BVH traversal — the hot-op kernel for large scenes.

Design: **shared-stack packet traversal** (the TPU analog of the ISPC
device's ray packets, devices/device_ispc/renderers/pathtracer.ispc:13-22,
scaled from 2x2-SSE packets to 1024-ray TPU packets):

* each grid program owns a block of B rays resident in VMEM registers;
* ONE scalar traversal stack (SMEM) is shared by the whole block — a node
  is visited iff ANY ray in the block intersects its bbox (vector slab
  test + scalar any-reduction), so there are **zero per-lane gathers**;
* leaf triangles stream through scalar-indexed VMEM reads, each tested
  against all B rays at once (dense VPU work);
* per-ray state (best t/tri/u/v) lives in vector registers the whole time.

Coherent packets (primary/shadow rays) cull almost as well as per-ray
traversal; incoherent packets degrade gracefully toward brute force while
staying branch-free per lane.

Node encoding (built by `pack_nodes`): (N, 8) f32 rows
  [lo.x lo.y lo.z hi.x hi.y hi.z  A  count]
  count == 0: interior, A = right-child index (left child is i+1)
  count  > 0: leaf, A = first triangle (in BVH-permuted order)
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
    right = np.zeros(n, np.int32)
    interior = bvh.count == 0
    # DFS layout: left child = i+1, right child = skip[i+1] (the end of
    # the left subtree is where the right subtree starts)
    left_idx = np.minimum(np.arange(n) + 1, n - 1)
    right[interior] = bvh.skip[left_idx[interior]]
    a = np.where(interior, right, bvh.start).astype(np.float32)
    return np.concatenate([
        bvh.lo.astype(np.float32), bvh.hi.astype(np.float32),
        a[:, None], bvh.count.astype(np.float32)[:, None]], axis=1)


def pack_tris(woop: np.ndarray, geom_host: dict) -> np.ndarray:
    """(G, 128) f32: 8 triangles per row, 16 floats each
    [woop.T flattened (12) | ng (3) | cull].  Zero padding rows are inert
    (woop zeros give d'_z == 0, which never passes the hit test)."""
    t = woop.shape[1] // 3
    w = np.asarray(woop, np.float32).reshape(4, t, 3)
    w = np.transpose(w, (1, 0, 2)).reshape(t, 12)
    flat = np.concatenate([
        w, np.asarray(geom_host['ng'], np.float32),
        np.asarray(geom_host['cull'], np.float32)[:, None]], axis=1)
    g = (t + 7) // 8
    out = np.zeros((g * 8, 16), np.float32)
    out[:t] = flat
    return out.reshape(g, 128)


def _kernel(nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tn_ref, tf_ref,
            t_out, tri_out, u_out, v_out,
            stack_ref, max_leaf: int, any_hit: bool):
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

    stack_ref[0] = 0    # push root

    def cond(state):
        sp = state[0]
        return sp >= 0

    def body(state):
        sp, t_best, tri_best, u_best, v_best = state
        node = stack_ref[sp]
        sp = sp - 1
        row = nodes_ref[node]                      # (8,) vector row

        # vector slab test against every ray in the packet
        t0x = (row[0] - ox) * ix
        t1x = (row[3] - ox) * ix
        t0y = (row[1] - oy) * iy
        t1y = (row[4] - oy) * iy
        t0z = (row[2] - oz) * iz
        t1z = (row[5] - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), tnear))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.minimum(jnp.maximum(t0z, t1z),
                                       jnp.minimum(tfar0, t_best)))
        hit_any = jnp.any(tmin <= tmax)

        a = row[6].astype(jnp.int32)
        count = row[7].astype(jnp.int32)
        is_leaf = count > 0

        # leaf triangles are processed 8 per packed row; boundary rows test
        # a few extra triangles, which is sound — every packed triangle is
        # real scene geometry (padding rows can never pass the hit test)
        g_first = a // 8
        g_count = (a + count + 7) // 8 - g_first
        max_groups = (max_leaf + 7) // 8 + 1

        def leaf_group(g, carry):
            def do_group(carry2):
                t_b, tri_b, u_b, v_b = carry2
                row = tris_ref[g_first + g]        # (128,) = 8 tris
                for k in range(8):                 # static unroll
                    w = row[16 * k:16 * (k + 1)]
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
                    ngd = dx * w[12] + dy * w[13] + dz * w[14]
                    # scalar-predicate boolean select doesn't legalize in
                    # Mosaic — use boolean algebra
                    cull_ok = (w[15] != 1.0) | (ngd < 0.0)
                    ok = ((jnp.abs(dwp) > 1e-12)
                          & (uh >= 0.0) & (vh >= 0.0) & (uh + vh <= 1.0)
                          & (th > tnear) & (th < jnp.minimum(tfar0, t_b))
                          & cull_ok)
                    t_b = jnp.where(ok, th, t_b)
                    tri_b = jnp.where(ok, (g_first + g) * 8 + k, tri_b)
                    u_b = jnp.where(ok, uh, u_b)
                    v_b = jnp.where(ok, vh, v_b)
                return t_b, tri_b, u_b, v_b

            return jax.lax.cond(g < g_count, do_group, lambda c: c, carry)

        def do_leaf(carry):
            return jax.lax.fori_loop(0, max_groups, leaf_group, carry)

        def do_interior(carry):
            return carry

        t_best, tri_best, u_best, v_best = jax.lax.cond(
            hit_any & is_leaf, do_leaf, do_interior,
            (t_best, tri_best, u_best, v_best))

        # push children of a hit interior node (shared stack, SMEM)
        push = hit_any & (~is_leaf)

        def do_push(sp):
            stack_ref[sp + 1] = a            # right child
            stack_ref[sp + 2] = node + 1     # left child (popped first)
            return sp + 2

        sp = jax.lax.cond(push & (sp + 2 < STACK), do_push,
                          lambda s: s, sp)
        return sp, t_best, tri_best, u_best, v_best

    init = (jnp.int32(0), jnp.full((BLOCK,), INF),
            jnp.full((BLOCK,), -1, jnp.int32),
            jnp.zeros((BLOCK,)), jnp.zeros((BLOCK,)))
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(cond, body,
                                                             init)
    t_out[:] = t_best
    tri_out[:] = tri_best
    u_out[:] = u_best
    v_out[:] = v_best


@partial(jax.jit, static_argnames=('max_leaf', 'interpret'))
def intersect_packet(nodes, tris, org, dirn, tnear, tfar,
                     max_leaf: int = 64, interpret: bool = False) -> Hit:
    """Closest-hit packet traversal.

    nodes: (N, 8) f32 (pack_nodes); tris: (T, 16) f32 (pack_tris);
    org/dirn: (R, 3) with R a multiple of BLOCK.
    """
    r = org.shape[0]
    assert r % BLOCK == 0, f"ray count must be a multiple of {BLOCK}"
    grid = (r // BLOCK,)

    def vec_spec():
        return pl.BlockSpec((BLOCK,), lambda i: (i,),
                            memory_space=pltpu.VMEM)

    t, tri, u, v = pl.pallas_call(
        partial(_kernel, max_leaf=max_leaf, any_hit=False),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris (full)
            vec_spec(), vec_spec(), vec_spec(),      # org xyz
            vec_spec(), vec_spec(), vec_spec(),      # dir xyz
            vec_spec(), vec_spec(),                  # tnear, tfar
        ],
        out_specs=[vec_spec(), vec_spec(), vec_spec(), vec_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.int32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32)],
        interpret=interpret,
    )(nodes, tris,
      org[:, 0], org[:, 1], org[:, 2],
      dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar)
    return Hit(t, tri, u, v)


def occluded_packet(nodes, tris, org, dirn, tnear, tfar,
                    max_leaf: int = 64, interpret: bool = False):
    """Any-hit via the same kernel (closest-hit then finiteness test —
    a dedicated early-exit variant is a further optimization)."""
    hit = intersect_packet(nodes, tris, org, dirn, tnear, tfar,
                           max_leaf=max_leaf, interpret=interpret)
    return hit.tri >= 0
