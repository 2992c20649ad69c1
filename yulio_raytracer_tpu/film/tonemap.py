"""Default tonemapper: gamma correction + optional cosine^3 vignetting.

Matches `devices/device_singleray/tonemappers/defaulttonemapper.h:25-52`
exactly, but as one fused elementwise pass over the whole frame (XLA fuses
this into the film resolve) instead of a per-pixel virtual call.
"""
from __future__ import annotations

import jax.numpy as jnp


def tonemap(rgb, gamma: float = 1.0, vignetting: bool = False):
    """rgb: (H, W, 3) linear -> display-referred (still float, unclamped)."""
    out = rgb
    if gamma != 1.0:
        out = jnp.power(jnp.maximum(out, 0.0), 1.0 / gamma)
    if vignetting:
        h, w = rgb.shape[0], rgb.shape[1]
        y = (jnp.arange(h, dtype=jnp.float32) - 0.5 * h)[:, None]
        x = (jnp.arange(w, dtype=jnp.float32) - 0.5 * w)[None, :]
        # distance scaled by half-width, as defaulttonemapper.h:46-48
        d = jnp.sqrt(x * x + y * y) / (0.5 * w)
        out = out * jnp.power(jnp.cos(d * 0.5), 3.0)[..., None]
    return out


def to_srgb_u8(rgb):
    """Clamp + quantize to u8 (framebuffer RGB8 store semantics:
    api/framebuffer.h:93-227 uses clamp01 * 255)."""
    return jnp.clip(rgb * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
