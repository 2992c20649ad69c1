"""Pallas dense intersector: every ray against every triangle, fully fused.

For golden-scene-sized geometry (10^2..10^4 triangles) the XLA dense path
(ops/intersect.py) is HBM-bound: the (R, T) candidate tensors spill to HBM
between the Woop matmul and the closest-hit select.  This kernel keeps a
1024-ray block in registers, streams the packed triangle rows from VMEM,
and reduces hits in-place — HBM traffic collapses to rays-in + hits-out.

Triangle layout shared with ops/pallas_traverse.py: (G, 128) f32 rows of 8
triangles x 16 floats [woop(12) | ng(3) | cull].
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, BARY_EPS

BLOCK = 1024
INF = float(np.inf)


def _tri8(w, k, ox, oy, oz, dx, dy, dz, tnear, tfar, t_b, tri_b, u_b, v_b,
          tri_index):
    """Test one triangle (16-float slice at static offset k) against the
    ray block; returns updated bests."""
    s = w[16 * k:16 * (k + 1)]
    oup = ox * s[0] + oy * s[3] + oz * s[6] + s[9]
    ovp = ox * s[1] + oy * s[4] + oz * s[7] + s[10]
    owp = ox * s[2] + oy * s[5] + oz * s[8] + s[11]
    dup = dx * s[0] + dy * s[3] + dz * s[6]
    dvp = dx * s[1] + dy * s[4] + dz * s[7]
    dwp = dx * s[2] + dy * s[5] + dz * s[8]
    inv_dw = jnp.where(jnp.abs(dwp) > 1e-12, 1.0 / dwp, 0.0)
    th = -owp * inv_dw
    uh = oup + th * dup
    vh = ovp + th * dvp
    ngd = dx * s[12] + dy * s[13] + dz * s[14]
    cull_ok = (s[15] != 1.0) | (ngd < 0.0)
    ok = ((jnp.abs(dwp) > 1e-12)
          & (uh >= -BARY_EPS) & (vh >= -BARY_EPS) & (uh + vh <= 1.0 + BARY_EPS)
          & (th > tnear) & (th < jnp.minimum(tfar, t_b))
          & cull_ok)
    return (jnp.where(ok, th, t_b), jnp.where(ok, tri_index, tri_b),
            jnp.where(ok, uh, u_b), jnp.where(ok, vh, v_b))


def _kernel(tris_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tn_ref, tf_ref, t_out, tri_out, u_out, v_out, num_groups: int):
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tnear = tn_ref[:]
    tfar = tf_ref[:]

    def group(g, carry):
        t_b, tri_b, u_b, v_b = carry
        w = tris_ref[g]
        for k in range(8):
            t_b, tri_b, u_b, v_b = _tri8(
                w, k, ox, oy, oz, dx, dy, dz, tnear, tfar,
                t_b, tri_b, u_b, v_b, g * 8 + k)
        return t_b, tri_b, u_b, v_b

    init = (jnp.full((BLOCK,), INF), jnp.full((BLOCK,), -1, jnp.int32),
            jnp.zeros((BLOCK,)), jnp.zeros((BLOCK,)))
    t_b, tri_b, u_b, v_b = jax.lax.fori_loop(0, num_groups, group, init)
    t_out[:] = t_b
    tri_out[:] = tri_b
    u_out[:] = u_b
    v_out[:] = v_b


@partial(jax.jit, static_argnames=('interpret',))
def intersect_dense(tris, org, dirn, tnear, tfar,
                    interpret: bool = False) -> Hit:
    """tris: (G, 128) packed rows; org/dirn: (R, 3), R % BLOCK == 0."""
    r = org.shape[0]
    assert r % BLOCK == 0
    g = tris.shape[0]

    def vec_spec():
        return pl.BlockSpec((BLOCK,), lambda i: (i,),
                            memory_space=pltpu.VMEM)

    t, tri, u, v = pl.pallas_call(
        partial(_kernel, num_groups=g),
        grid=(r // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  vec_spec(), vec_spec(), vec_spec(),
                  vec_spec(), vec_spec(), vec_spec(),
                  vec_spec(), vec_spec()],
        out_specs=[vec_spec(), vec_spec(), vec_spec(), vec_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.int32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
            jax.ShapeDtypeStruct((r,), jnp.float32),
        ],
        interpret=interpret,
    )(tris, org[:, 0], org[:, 1], org[:, 2],
      dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar)
    return Hit(t, tri, u, v)


def _kernel_occ(tris_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                tn_ref, tf_ref, occ_out, num_groups: int):
    """Any-hit variant: no closest-hit bookkeeping; the group loop stops
    as soon as the whole packet is occluded."""
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tnear = tn_ref[:]
    tfar = tf_ref[:]

    # Mosaic can't carry i1 vectors through scf loops — keep occ as i32.
    # No early-exit: the all-occluded scalar reduction per group costs more
    # than it saves (measured on v5e).
    def body(g, occ):
        w = tris_ref[g]
        for k in range(8):
            s = w[16 * k:16 * (k + 1)]
            oup = ox * s[0] + oy * s[3] + oz * s[6] + s[9]
            ovp = ox * s[1] + oy * s[4] + oz * s[7] + s[10]
            owp = ox * s[2] + oy * s[5] + oz * s[8] + s[11]
            dup = dx * s[0] + dy * s[3] + dz * s[6]
            dvp = dx * s[1] + dy * s[4] + dz * s[7]
            dwp = dx * s[2] + dy * s[5] + dz * s[8]
            inv_dw = jnp.where(jnp.abs(dwp) > 1e-12, 1.0 / dwp, 0.0)
            th = -owp * inv_dw
            uh = oup + th * dup
            vh = ovp + th * dvp
            ngd = dx * s[12] + dy * s[13] + dz * s[14]
            cull_ok = (s[15] != 1.0) | (ngd < 0.0)
            hit = ((jnp.abs(dwp) > 1e-12)
                   & (uh >= -BARY_EPS) & (vh >= -BARY_EPS) & (uh + vh <= 1.0 + BARY_EPS)
                   & (th > tnear) & (th < tfar) & cull_ok)
            occ = jnp.maximum(occ, hit.astype(jnp.int32))
        return occ

    occ = jax.lax.fori_loop(0, num_groups, body,
                            jnp.zeros((BLOCK,), jnp.int32))
    occ_out[:] = occ


@partial(jax.jit, static_argnames=('interpret',))
def occluded_dense(tris, org, dirn, tnear, tfar, interpret: bool = False):
    r = org.shape[0]
    assert r % BLOCK == 0
    g = tris.shape[0]

    def vec_spec():
        return pl.BlockSpec((BLOCK,), lambda i: (i,),
                            memory_space=pltpu.VMEM)

    occ = pl.pallas_call(
        partial(_kernel_occ, num_groups=g),
        grid=(r // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  vec_spec(), vec_spec(), vec_spec(),
                  vec_spec(), vec_spec(), vec_spec(),
                  vec_spec(), vec_spec()],
        out_specs=vec_spec(),
        out_shape=jax.ShapeDtypeStruct((r,), jnp.int32),
        interpret=interpret,
    )(tris, org[:, 0], org[:, 1], org[:, 2],
      dirn[:, 0], dirn[:, 1], dirn[:, 2], tnear, tfar)
    return occ != 0
