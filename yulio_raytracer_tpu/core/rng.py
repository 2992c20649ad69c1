"""Counter-based, stateless RNG for wavefront rendering.

The reference renderer uses per-thread mutable `Random` state plus
precomputed multi-jittered sample sets keyed by tile coordinates
(`samplers/sampler.cpp:85-160`, seed from tile + firstActiveLine
`integratorrenderer.cpp:134`), which makes renders deterministic per
(scene, spp, serverID).  On TPU the idiomatic equivalent is a *stateless*
counter-based hash: every random number is a pure function of
(seed, pixel_id, sample_id, bounce, dimension), so results are independent
of sharding/layout — the same determinism property, without any state.

We use the pcg4d hash (Jarzynski & Olano, JCGT 2020 — public domain
algorithm), which is high quality and only ~20 int ops per 4 lanes.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
_INV_2_32 = float(2.0 ** -32)


def _as_u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def pcg4d(a, b, c, d):
    """pcg4d hash: four u32 in, four decorrelated u32 out."""
    v0 = _as_u32(a)
    v1 = _as_u32(b)
    v2 = _as_u32(c)
    v3 = _as_u32(d)
    mul = _U32(1664525)
    inc = _U32(1013904223)
    v0 = v0 * mul + inc
    v1 = v1 * mul + inc
    v2 = v2 * mul + inc
    v3 = v3 * mul + inc
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


def _to_unit_float(u):
    """u32 -> float32 in [0, 1)."""
    return u.astype(jnp.float32) * jnp.float32(_INV_2_32)


def uniform1(seed, pixel_id, sample_id, dim):
    """One float in [0,1) per lane."""
    v0, _, _, _ = pcg4d(seed, pixel_id, sample_id, dim)
    return _to_unit_float(v0)


def uniform2(seed, pixel_id, sample_id, dim):
    """Two floats in [0,1) per lane, shape (..., 2)."""
    v0, v1, _, _ = pcg4d(seed, pixel_id, sample_id, dim)
    return jnp.stack([_to_unit_float(v0), _to_unit_float(v1)], axis=-1)


def uniform3(seed, pixel_id, sample_id, dim):
    v0, v1, v2, _ = pcg4d(seed, pixel_id, sample_id, dim)
    return jnp.stack([_to_unit_float(v0), _to_unit_float(v1),
                      _to_unit_float(v2)], axis=-1)


def hash_u32(a, b=0, c=0, d=0):
    """A single decorrelated u32 (e.g. for stratum permutation)."""
    v0, _, _, _ = pcg4d(a, b, c, d)
    return v0
