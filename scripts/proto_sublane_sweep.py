"""Prototype: dense pair-test sweep in the NARROW-PACKET layout.

Question to answer before building the wide-BVH narrow-packet kernel:
what does the Woop pair test cost per pair when 8 TRIANGLES ride the
sublane dimension against 128 rays in lanes ((8,128) tile ops), versus
the production layout (per-triangle scalar broadcasts against a 1024-ray
(8,128) packet)?

The narrow layout's per-row extras are the (1,128)->(8,16) relayout of
the packed tri row, 16 implicit (8,1)->(8,128) lane broadcasts, and a
sublane lex-min reduction of the 8 candidate hits; the production
layout pays 16 scalar lane-extracts per triangle (128 per row) but no
reduction.  If the narrow layout holds >= ~60% of the production
Gpairs/s, the 4-6x union shrink at 128-ray granularity (measured,
scripts/diag_union.py) wins overall.

Usage: python scripts/proto_sublane_sweep.py [--rows 2048] [--iters 64]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float(np.inf)


def old_kernel(tris_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_out, tri_out, rows: int, reps: int):
    """Production-layout sweep: 1024 rays, per-tri scalar extracts."""
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def rep(r, carry):
        def row_step(g, carry):
            t_b, tri_b = carry
            row = tris_ref[g]
            for k in range(8):
                w = row[16 * k:16 * (k + 1)]
                oup = ox * w[0] + oy * w[3] + oz * w[6] + w[9]
                ovp = ox * w[1] + oy * w[4] + oz * w[7] + w[10]
                owp = ox * w[2] + oy * w[5] + oz * w[8] + w[11]
                dup = dx * w[0] + dy * w[3] + dz * w[6]
                dvp = dx * w[1] + dy * w[4] + dz * w[7]
                dwp = dx * w[2] + dy * w[5] + dz * w[8]
                inv = jnp.where(jnp.abs(dwp) > 1e-12, 1.0 / dwp, 0.0)
                th = -owp * inv
                uh = oup + th * dup
                vh = ovp + th * dvp
                ok = ((jnp.abs(dwp) > 1e-12) & (uh >= 0.0) & (vh >= 0.0)
                      & (uh + vh <= 1.0) & (th > 0.0) & (th < t_b))
                t_b = jnp.where(ok, th, t_b)
                tri_b = jnp.where(ok, g * 8 + k, tri_b)
            return t_b, tri_b
        return jax.lax.fori_loop(0, rows, row_step, carry)

    t0 = jnp.full((1024,), INF) + ox * 0.0
    tri0 = jnp.full((1024,), -1, jnp.int32)
    t_b, tri_b = jax.lax.fori_loop(0, reps, rep, (t0, tri0))
    t_out[:] = t_b
    tri_out[:] = tri_b


def _sweep8(w, g, ox, oy, oz, dx, dy, dz, t_b, tri_b):
    """Test the 8 sublane triangles of w (8,16) against 128 lane rays."""
    c = lambda j: w[:, j:j + 1]         # (8, 1) lane-broadcast column
    oup = ox * c(0) + oy * c(3) + oz * c(6) + c(9)
    ovp = ox * c(1) + oy * c(4) + oz * c(7) + c(10)
    owp = ox * c(2) + oy * c(5) + oz * c(8) + c(11)
    dup = dx * c(0) + dy * c(3) + dz * c(6)
    dvp = dx * c(1) + dy * c(4) + dz * c(7)
    dwp = dx * c(2) + dy * c(5) + dz * c(8)
    inv = jnp.where(jnp.abs(dwp) > 1e-12, 1.0 / dwp, 0.0)
    th = -owp * inv                      # (8, 128)
    uh = oup + th * dup
    vh = ovp + th * dvp
    ok = ((jnp.abs(dwp) > 1e-12) & (uh >= 0.0) & (vh >= 0.0)
          & (uh + vh <= 1.0) & (th > 0.0) & (th < t_b))
    tcand = jnp.where(ok, th, INF)
    # lex-min over the 8 sublane candidates: min t, then min k
    tmin = jnp.min(tcand, axis=0, keepdims=True)     # (1, 128)
    kk = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    kmin = jnp.min(jnp.where(tcand == tmin, kk, 8), axis=0,
                   keepdims=True)
    hit = tmin < t_b
    t_b = jnp.where(hit, tmin, t_b)
    tri_b = jnp.where(hit, g * 8 + kmin, tri_b)
    return t_b, tri_b


def new_kernel(tris_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_out, tri_out, rows: int, reps: int, switch: bool):
    """Narrow-packet layout: 128 rays in lanes, 8 tris on sublanes.

    tris_ref is the super-tile packing: tile t = rows [8t, 8t+8), 64
    triangles; group g (8 tris) = lane block g%8 of tile g//8, sublane =
    tri within group.  `switch` reads one group per step through an
    8-way lane-block switch (the real kernel's leaf access pattern);
    otherwise the 8 lane blocks unroll statically (upper bound)."""
    ox = ox_ref[:]          # (1, 128)
    oy, oz = oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def rep(r, carry):
        if switch:
            def g_step(g, carry):
                t_b, tri_b = carry
                tile = tris_ref[pl.ds(8 * (g // 8), 8), :]   # (8, 128)
                w = jax.lax.switch(
                    g % 8,
                    [lambda tl, jj=jj: tl[:, 16 * jj:16 * (jj + 1)]
                     for jj in range(8)], tile)
                return _sweep8(w, g, ox, oy, oz, dx, dy, dz, t_b, tri_b)
            return jax.lax.fori_loop(0, rows * 8, g_step, carry)

        def tile_step(t, carry):
            tile = tris_ref[pl.ds(8 * t, 8), :]              # (8, 128)
            for jj in range(8):
                w = tile[:, 16 * jj:16 * (jj + 1)]
                carry = _sweep8(w, t * 8 + jj, ox, oy, oz, dx, dy, dz,
                                *carry)
            return carry
        return jax.lax.fori_loop(0, rows, tile_step, carry)

    t0 = jnp.full((1, 128), INF) + ox * 0.0
    tri0 = jnp.full((1, 128), -1, jnp.int32)
    t_b, tri_b = jax.lax.fori_loop(0, reps, rep, (t0, tri0))
    t_out[:] = t_b
    tri_out[:] = tri_b


def run(which: str, rows: int, reps: int, iters: int):
    """Equal-work comparison: every variant tests rows*8*1024 pairs/rep
    (old: rows 8-tri rows x 1024 rays; new: rows 64-tri super-tiles x
    128 rays)."""
    rs = np.random.RandomState(0)
    if which == 'old':
        shape = (1024,)
        tris = rs.rand(rows, 128).astype(np.float32)
        kern = lambda *a: old_kernel(*a, rows=rows, reps=reps)
    else:
        shape = (1, 128)
        tris = rs.rand(rows * 8, 128).astype(np.float32)
        kern = lambda *a: new_kernel(*a, rows=rows, reps=reps,
                                     switch=(which == 'newsw'))
    pairs = rows * 8 * 1024 * reps
    rays = [rs.rand(*shape).astype(np.float32) for _ in range(6)]

    f = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.int32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )
    jf = jax.jit(lambda t, r: f(t, *r))
    out = jf(tris, rays)
    np.asarray(out[0].ravel()[:1])          # fetch-sync warmup
    # dispatch all iters (input-varied), fetch ONCE: a per-iter fetch
    # would fold the ~30 ms RPC floor into every sample
    rays2 = [[r + np.float32(1e-6 * (i + 1)) for r in rays]
             for i in range(iters)]
    t0 = time.perf_counter()
    for i in range(iters):
        out = jf(tris, rays2[i])
    np.asarray(out[0].ravel()[:1])
    dt = time.perf_counter() - t0
    gp = pairs * iters / dt / 1e9
    print("%s: %.2f Gpairs/s  (%.3f s, %d iters)" % (which, gp, dt, iters))
    return gp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=512)
    ap.add_argument('--reps', type=int, default=64)
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--what', default='old,new')
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    for w in args.what.split(','):
        run(w, args.rows, args.reps, args.iters)


if __name__ == '__main__':
    main()
