"""Frame rendering: the RenderJob / renderTile pipeline as ray-batch passes.

The reference renders 16x16 tiles stolen off an atomic counter by a thread
pool (`renderers/integratorrenderer.cpp:63-185`).  The TPU equivalent
renders the frame as a sequence of dense ray *chunks* (pixels x samples),
each one jitted pass over the wavefront integrator; chunking bounds device
memory the way tiles bounded cache footprint.  Progressive refinement
("accumulate" mode, glutdisplay/outputMode) maps to film accumulation with
the iteration index salted into the RNG stream — deterministic and
resumable exactly like the reference's precomputed sample chunks
(`sampler.cpp:93-97`).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .film import accum
from .integrator import pathtracer
from .sampling import patterns

# RNG dims reserved for the camera
DIM_PIXEL = 0
DIM_LENS = 1


@partial(jax.jit, static_argnames=('params', 'spp', 'width', 'height'))
def _render_chunk(scene, camera, params, width, height, spp,
                  pixel_ids, sample_ids, seed, backplate=None):
    """One jitted pass: generate rays for (pixel, sample) pairs and
    integrate. Returns ((B, 3) radiance, ray count).

    scene and camera are pytrees (arrays = data, config = static metadata),
    so new camera transforms reuse the compiled executable."""
    seed = jnp.uint32(seed)
    px = (pixel_ids % width).astype(jnp.float32)
    py = (pixel_ids // width).astype(jnp.float32)
    juv = patterns.pixel_sample(seed, pixel_ids, sample_ids, spp, DIM_PIXEL)
    uv = jnp.stack([(px + juv[:, 0]) / width,
                    (py + juv[:, 1]) / height], axis=-1)
    lens = patterns.sample_2d(seed, pixel_ids, sample_ids, jnp.uint32(DIM_LENS))
    org, dirn = camera.ray(uv, lens)
    return pathtracer.trace(scene, params, org, dirn, seed,
                            pixel_ids, sample_ids, pixel_uv=uv,
                            backplate=backplate)


@dataclass
class FrameStats:
    num_rays: float = 0.0
    seconds: float = 0.0

    @property
    def mrps(self):
        return self.num_rays / max(self.seconds, 1e-9) / 1e6


def render_frame(scene, camera, params, width: int, height: int, spp: int,
                 film: Optional[accum.Film] = None, seed: int = 0,
                 iteration: int = 0, accumulate: bool = True,
                 max_rays_per_pass: int = 1 << 17,
                 backplate=None, progress_cb=None, stop_flag=None):
    """Render spp samples/pixel into the film (creating it if needed).

    Deterministic per (scene, spp, seed, iteration).  Returns
    (film, FrameStats).  `progress_cb(fraction)` mirrors the reference's
    per-tile progress callback (integratorrenderer.cpp:178).
    """
    import time
    if film is None or not accumulate:
        film = accum.create(height, width)
    npix = width * height

    # pack as many full-frame sample passes per chunk as the ray budget
    # allows; otherwise split the frame into pixel ranges
    t0 = time.perf_counter()
    total_rays = 0.0
    rgb_flat = film.rgb_sum.reshape(npix, 3)

    pix_per_pass = max(min(npix, max_rays_per_pass), 1)
    n_splits = (npix + pix_per_pass - 1) // pix_per_pass
    work = [(s, k) for s in range(spp) for k in range(n_splits)]
    for wi, (s, k) in enumerate(work):
        if stop_flag is not None and stop_flag():
            break
        lo = k * pix_per_pass
        hi = min(lo + pix_per_pass, npix)
        count = hi - lo
        # pad the ragged tail to keep one compiled shape
        ids = lo + (np.arange(pix_per_pass, dtype=np.uint32) % max(count, 1))
        pixel_ids = jnp.asarray(ids)
        sample_ids = jnp.full((pix_per_pass,),
                              np.uint32(iteration * spp + s))
        rgb, nrays = _render_chunk(scene, camera, params, width, height,
                                   spp, pixel_ids, sample_ids,
                                   np.uint32(seed), backplate)
        rgb = rgb[:count]
        rgb_flat = jax.lax.dynamic_update_slice(
            rgb_flat, jax.lax.dynamic_slice(rgb_flat, (lo, 0),
                                            (count, 3)) + rgb, (lo, 0))
        total_rays += float(nrays)
        if progress_cb is not None:
            progress_cb((wi + 1) / len(work))

    new_film = accum.Film(rgb_flat.reshape(height, width, 3),
                          film.weight + float(spp))
    jax.block_until_ready(new_film.rgb_sum)
    dt = time.perf_counter() - t0
    return new_film, FrameStats(total_rays, dt)
