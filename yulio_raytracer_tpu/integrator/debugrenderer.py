"""Debug renderer: white-on-escape diffuse-bounce visualization.

Vectorized port of `renderers/debugrenderer.cpp:28-130`: center-pixel
primary rays, up to maxDepth cosine-weighted diffuse bounces (no shading),
writing white where the path escapes — a fast scene/BVH sanity view and
ray-throughput microbenchmark (it prints the same fps/ms/mrps line).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core import rng, math as vm
from ..ops import intersect as ops_i
from ..sampling import shapesampler as ss
from ..integrator.pathtracer import _intersect

ULP = 1.1920929e-7


@dataclass(frozen=True)
class DebugParams:
    max_depth: int = 1
    spp: int = 1


def trace(scene, params: DebugParams, org, dirn, seed, pixel_id):
    """Returns ((R, 3) color — white on escape, black on absorb/deep hit —
    and the traced-ray count)."""
    r = org.shape[0]
    seed = jnp.uint32(seed)

    def bounce(state, depth):
        org, dirn, alive, escaped, nrays = state
        hit = _intersect(scene, org, dirn, jnp.zeros((r,)),
                         jnp.full((r,), jnp.inf))
        nrays = nrays + jnp.sum(alive)
        escaped = escaped | (alive & ~hit.valid)
        alive = alive & hit.valid
        # diffuse bounce (debugrenderer.cpp:113-119)
        idx = jnp.maximum(hit.tri, 0)
        ng = vm.normalize(scene.geom['ng'][idx])
        nf = jnp.where(vm.dot(-dirn, ng)[:, None] < 0, -ng, ng)
        u2 = rng.uniform2(seed, pixel_id, jnp.uint32(0),
                          jnp.uint32(8) + depth.astype(jnp.uint32))
        new_dir, _ = ss.cosine_sample_hemisphere(u2[..., 0], u2[..., 1], nf)
        new_org = org + 0.999 * hit.t[:, None] * dirn
        org = jnp.where(alive[:, None], new_org, org)
        dirn = jnp.where(alive[:, None], new_dir, dirn)
        return (org, dirn, alive, escaped, nrays), None

    init = (org, dirn, jnp.ones((r,), bool), jnp.zeros((r,), bool),
            jnp.zeros((), jnp.float32))
    (org, dirn, alive, escaped, nrays), _ = jax.lax.scan(
        bounce, init, jnp.arange(params.max_depth, dtype=jnp.int32))
    color = jnp.where(escaped[:, None], 1.0, 0.0) * jnp.ones((r, 3))
    return color, nrays
