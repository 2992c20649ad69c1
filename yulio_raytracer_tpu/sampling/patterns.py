"""Stratified / multi-jittered sample patterns as pure functions.

The reference precomputes 64 multi-jittered sample sets per tile on the host
(`samplers/sampler.cpp:85-160`) because its integrator consumes samples
serially per thread.  A wavefront renderer instead evaluates the pattern
*in place*: the j-th pixel sample of pixel p at iteration k is a pure
function of (seed, p, j, k).  Stratification is preserved — sample j lands
in stratum j of an a x b grid (spp rounded up to the next square-ish grid,
mirroring sampler.cpp:91's round-to-pow2), jittered by the pcg4d hash, and
the stratum order is decorrelated between pixels by a per-pixel XOR scramble
(the stateless analog of sampler.cpp:134's hashed sample-set pick).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import rng


def grid_dims(spp: int) -> tuple[int, int]:
    """Factor spp into the most square a x b grid with a*b >= spp."""
    a = int(np.floor(np.sqrt(spp)))
    while a > 1 and spp % a != 0:
        a -= 1
    return a, spp // a


def grid_scalars(spp: int):
    """The stratification grid of `spp` as four numpy scalars
    (a, n, 1/a, 1/b), suitable for passing TRACED through a jit
    boundary: the factorization itself is host-side (data-dependent
    loop), but the compiled pattern only consumes these scalars, so one
    compiled render graph serves every spp.  The reciprocals are
    f32-rounded on the host exactly like the static path's Python-float
    constants — the two paths are bit-identical."""
    a, b = grid_dims(spp)
    return (np.uint32(a), np.uint32(a * b),
            np.float32(1.0 / a), np.float32(1.0 / b))


def pixel_sample(seed, pixel_id, sample_id, spp, dim: int = 0):
    """Jittered-stratified 2D sample in [0,1)^2 for pixel-position dims.

    pixel_id/sample_id: broadcastable int arrays.  spp: either a static
    int, or a traced grid_scalars() tuple (spp-independent graph).
    """
    if isinstance(spp, tuple):
        a, n, inv_a, inv_b = spp
    else:
        ai, bi = grid_dims(spp)
        a, n = ai, ai * bi
        inv_a, inv_b = np.float32(1.0 / ai), np.float32(1.0 / bi)
    a_u = jnp.asarray(a, jnp.uint32)
    n_u = jnp.asarray(n, jnp.uint32)
    # per-pixel decorrelation of stratum order
    scramble = rng.hash_u32(pixel_id, jnp.uint32(dim), seed, jnp.uint32(0x9E3779B9))
    s = (jnp.asarray(sample_id).astype(jnp.uint32) + scramble) % n_u
    sx = (s % a_u).astype(jnp.float32)
    sy = (s // a_u).astype(jnp.float32)
    jitter = rng.uniform2(seed, pixel_id, sample_id, jnp.uint32(dim))
    u = (sx + jitter[..., 0]) * inv_a
    v = (sy + jitter[..., 1]) * inv_b
    return jnp.stack([u, v], axis=-1)


def pixel_sample_bspline(seed, pixel_id, sample_id, spp: int, dim: int = 0):
    """Cubic B-spline pixel-filter importance sampling — the reference's
    default filter (integratorrenderer.cpp:45-49, filters/filter.h:25-43).

    A cubic B-spline is the 4-fold convolution of unit boxes, so a filter
    variate is the sum of four uniforms minus 2 (support [-2, 2]); samples
    get unit weight because the filter is sampled by importance.  The
    first pair of uniforms reuses the stratified stratum so spatial
    stratification is preserved.
    """
    s0 = pixel_sample(seed, pixel_id, sample_id, spp, dim)
    u1 = rng.uniform2(seed, pixel_id, sample_id,
                      jnp.uint32(dim) ^ jnp.uint32(0x5F375A86))
    u2 = rng.uniform2(seed, pixel_id, sample_id,
                      jnp.uint32(dim) ^ jnp.uint32(0x2545F491))
    u3 = rng.uniform2(seed, pixel_id, sample_id,
                      jnp.uint32(dim) ^ jnp.uint32(0x9E3779B9))
    # sum of 4 U(0,1) - 2 ~ cubic B-spline on [-2, 2], centered at 0.5
    return 0.5 + (s0 + u1 + u2 + u3) - 2.0


def sample_2d(seed, pixel_id, sample_id, dim):
    """Unstratified 2D sample for scatter/light dims (sampler.cpp:110-112
    uses jittered 1D/2D; decorrelated hash is the wavefront analog)."""
    return rng.uniform2(seed, pixel_id, sample_id, dim)


def sample_1d(seed, pixel_id, sample_id, dim):
    return rng.uniform1(seed, pixel_id, sample_id, dim)
