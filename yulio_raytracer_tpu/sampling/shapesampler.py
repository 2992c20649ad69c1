"""Vectorized shape sampling (hemisphere / sphere / cone / triangle / disk).

Re-implements the formulas of the reference's
`devices/device_singleray/samplers/shapesampler.h` over batched (..., 2)
sample arrays; all functions are pure and differentiable-friendly.
PDF conventions match the reference exactly (solid-angle densities).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as vm

TWO_PI = float(2.0 * np.pi)
ONE_OVER_PI = float(1.0 / np.pi)
ONE_OVER_TWO_PI = float(1.0 / (2.0 * np.pi))
ONE_OVER_FOUR_PI = float(1.0 / (4.0 * np.pi))


def _local_to_world(n, local):
    dx, dy, dz = vm.frame(n)
    return (local[..., 0:1] * dx + local[..., 1:2] * dy + local[..., 2:3] * dz)


def uniform_sample_sphere(u, v):
    """shapesampler.h:32-36. Returns (dir, pdf)."""
    phi = TWO_PI * u
    cos_t = 1.0 - 2.0 * v
    sin_t = 2.0 * jnp.sqrt(jnp.maximum(v * (1.0 - v), 0.0))
    d = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    return d, jnp.full(jnp.shape(u), ONE_OVER_FOUR_PI, jnp.float32)


def cosine_sample_hemisphere(u, v, n=None):
    """shapesampler.h:95-110. Returns (dir, pdf); up = n (or +z)."""
    phi = TWO_PI * u
    cos_t = jnp.sqrt(jnp.maximum(v, 0.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - v, 0.0))
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t],
                      axis=-1)
    pdf = cos_t * ONE_OVER_PI
    if n is None:
        return local, pdf
    return _local_to_world(n, local), pdf


def cosine_hemisphere_pdf(wi, n):
    """shapesampler.h:113-115."""
    c = vm.dot(wi, n)
    return jnp.where(c < 0.0, 0.0, c * ONE_OVER_PI)


def power_cosine_sample_hemisphere(u, v, exp, n=None):
    """shapesampler.h:119-136. Returns (dir, pdf)."""
    phi = TWO_PI * u
    cos_t = jnp.power(jnp.maximum(v, 1e-30), 1.0 / (exp + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t],
                      axis=-1)
    pdf = (exp + 1.0) * jnp.power(cos_t, exp) * ONE_OVER_TWO_PI
    if n is None:
        return local, pdf
    return _local_to_world(n, local), pdf


def power_cosine_hemisphere_pdf(wi, n, exp):
    """shapesampler.h:139-141."""
    c = vm.dot(wi, n)
    return jnp.where(c < 0.0, 0.0,
                     (exp + 1.0) * jnp.power(jnp.maximum(c, 0.0), exp)
                     * ONE_OVER_TWO_PI)


def uniform_sample_cone(u, v, angle):
    """shapesampler.h:149-156 — cone around +z with half-angle `angle`.
    Returns (dir, pdf)."""
    phi = TWO_PI * u
    cos_a = jnp.cos(angle)
    cos_t = 1.0 - v * (1.0 - cos_a)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    d = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    pdf = 1.0 / (TWO_PI * (1.0 - cos_a))
    return d, jnp.broadcast_to(jnp.asarray(pdf, jnp.float32), jnp.shape(u))


def uniform_sample_triangle(u, v, a, b, c):
    """shapesampler.h:177-180 — area-uniform point on triangle ABC."""
    su = jnp.sqrt(jnp.maximum(u, 0.0))[..., None]
    return c + (1.0 - su) * (a - c) + (v[..., None] * su) * (b - c)


def uniform_sample_disk(sample, radius):
    """shapesampler.h:187-191 — point on a disk of given radius, (..., 2)."""
    r = jnp.sqrt(jnp.maximum(sample[..., 0], 0.0))
    theta = TWO_PI * sample[..., 1]
    return jnp.stack([radius * r * jnp.cos(theta),
                      radius * r * jnp.sin(theta)], axis=-1)
