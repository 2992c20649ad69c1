"""Output mode: mono frame and stereoscopic cube-map pipelines.

The function equivalents of `renderer.cpp` outputMode (:508-905): render,
tonemap, watermark, strip assembly, file naming — shared by the CLI and
the async session API.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from ..cameras import cameras as gcam
from ..film import accum, tonemap, stereo_strip
from ..integrator import pathtracer as pt
from ..io import ecs as gecs
from ..io import image as gimage
from .. import renderer as grenderer


def params_from_settings(settings: gecs.RenderSettings) -> pt.PTParams:
    return pt.PTParams(
        max_depth=settings.depth if settings.depth >= 0 else 10,
        min_contribution=settings.min_contribution,
        t_max_shadow_ray=settings.t_max_shadow_ray,
        t_max_shadow_jitter=settings.t_max_shadow_jitter,
        up=tuple(settings.cam_up),
    )


def settings_mesh(settings: gecs.RenderSettings):
    """Device mesh for the production render paths (the `-connect`
    device-selection seam, renderer.cpp:948-956): settings.devices = 1
    renders single-chip, 0 fans out over every visible chip, N over the
    first N.  Returns None when no fan-out applies."""
    if settings.devices == 1:
        return None
    import jax
    from ..parallel import sharding
    avail = len(jax.devices())
    n = settings.devices if settings.devices > 0 else avail
    n = min(n, avail)
    if n <= 1:
        return None
    return sharding.make_mesh(n)


def mono_camera(settings: gecs.RenderSettings):
    """createCamera (renderer.cpp:310-349): pinhole, or DoF when radius>0."""
    l2w = gcam.look_at(settings.cam_pos, settings.cam_look_at,
                       settings.cam_up)
    aspect = settings.width / settings.height
    if settings.cam_radius == 0.0:
        return gcam.Pinhole(l2w, angle=settings.fov, aspect=aspect)
    return gcam.DepthOfField(l2w, angle=settings.fov, aspect=aspect,
                             lens_radius=settings.cam_radius,
                             focal_distance=settings.focal_distance)


def render_mono(scene, settings: gecs.RenderSettings, out_file: str,
                seed: int = 0, progress_cb=None, stop_flag=None):
    """outputMode mono path (renderer.cpp:882-904): render -o image."""
    camera = mono_camera(settings)
    params = params_from_settings(settings)
    mesh = settings_mesh(settings)
    film = None
    stats_total = None
    for frame in range(max(settings.num_frames, 1)):
        film, stats = grenderer.render_frame(
            scene, camera, params, settings.width, settings.height,
            settings.spp, film=film, iteration=frame,
            accumulate=bool(settings.accumulate) or frame == 0,
            seed=seed, backplate=_bp(settings),
            pixel_filter=settings.pixel_filter,
            sampler=settings.sampler,
            progress_cb=progress_cb, stop_flag=stop_flag, mesh=mesh)
        stats_total = stats
    img = tonemap.tonemap(accum.resolve(film), gamma=settings.gamma,
                          vignetting=settings.vignetting)
    if out_file:
        gimage.store(out_file, np.asarray(img),
                     jpeg_quality=settings.jpeg_quality)
    return np.asarray(img), stats_total


def _bp(settings):
    import jax.numpy as jnp
    if settings.backplate is None:
        return None
    return jnp.asarray(settings.backplate[..., :3], jnp.float32)


def render_stereo(sb, settings: gecs.RenderSettings, rigs,
                  scene_base: str, out_dir: str = '.',
                  watermark: Optional[np.ndarray] = None,
                  seed: int = 0,
                  stage_cb: Optional[Callable] = None,
                  progress_cb: Optional[Callable] = None,
                  stop_flag: Optional[Callable] = None,
                  debug_faces: bool = False,
                  client=None):
    """The stereoscopic outputMode (renderer.cpp:508-736).

    sb: SceneBuilder (uncommitted — billboards recommit per viewpoint);
    rigs: list of (camera_name, [12 StereoCube cameras]).
    client: optional parallel.network.NetworkClient — faces render on
    the distributed TCP device (the reference's network Device serves
    every output mode); set_scene must already have been called.
    Returns list of written strip filenames.
    """
    if settings.watermark and watermark is None:
        watermark = stereo_strip.load_watermark()
    if not settings.watermark:
        watermark = None

    # square cube faces (renderer.cpp:529-533)
    size = max(settings.width, settings.height)
    params = params_from_settings(settings)
    mesh = settings_mesh(settings)

    written = []
    saved = []
    total_faces = max(len(rigs) * 12, 1)
    scene_static = None
    for ci, (camera_name, cams) in enumerate(rigs):
        if stop_flag is not None and stop_flag():
            break
        # re-orient camera-aligned billboards toward this viewpoint
        # (rtUpdatePrimitive + rtCommit, renderer.cpp:550-559)
        origin = np.asarray(cams[0].local2world[3])
        if client is None and (sb.has_billboards() or scene_static is None):
            scene_static = sb.commit(view_pos=origin,
                                     view_up=settings.cam_up,
                                     accel=settings.accel)
        faces = []
        for face_index in range(12):
            if stop_flag is not None and stop_flag():
                break
            if stage_cb is not None:
                stage_cb(ci * 12 + face_index, total_faces)
            cam = cams[face_index]
            if settings.toe_in and not cam.toe_in:
                cam = gcam.StereoCube(
                    cam.local2world, cam.cube_face_index, cam.origin,
                    cam.up, cam.scene_scale, cam.eye_separation,
                    cam.zero_parallax, True, cam.falloff_angle)

            # Each cube face is the idempotent retry unit (SURVEY §5
            # failure-detection: the reference restarts at face
            # granularity, renderer.cpp:656-660).  Deterministic seeding
            # makes a retried face bit-identical to an untroubled one; a
            # second failure propagates to the session error history.
            def _face(cam=cam, face_index=face_index, ci=ci,
                      origin=origin):
                if client is not None:
                    # distributed TCP device: each server renders its
                    # 4-row bands; merged sums ARE the film
                    import jax.numpy as jnp
                    from ..film import accum as gaccum
                    rgb_sum, weight = client.render(
                        cam, params, size, size, settings.spp, seed=seed,
                        pixel_filter=settings.pixel_filter,
                        backplate=settings.backplate,
                        view_pos=origin, view_up=tuple(settings.cam_up))
                    if progress_cb is not None:
                        progress_cb((ci * 12 + face_index + 1)
                                    / total_faces)
                    return gaccum.Film(jnp.asarray(rgb_sum),
                                       jnp.asarray(weight))
                film, _ = grenderer.render_frame(
                    scene_static, cam, params, size, size, settings.spp,
                    seed=seed, backplate=_bp(settings),
                    pixel_filter=settings.pixel_filter,
                    sampler=settings.sampler,
                    progress_cb=(lambda f: progress_cb(
                        (ci * 12 + face_index + f) / total_faces))
                    if progress_cb else None,
                    stop_flag=stop_flag, mesh=mesh)
                return film

            try:
                film = _face()
            except Exception as e:                    # pragma: no cover
                from ..utils import logging as glog
                glog.warning("face %d of camera %r failed (%s); "
                             "retrying once" % (face_index, camera_name, e))
                film = _face()
            img = np.asarray(tonemap.tonemap(accum.resolve(film),
                                             gamma=settings.gamma,
                                             vignetting=settings.vignetting))
            img = stereo_strip.apply_watermark(img, watermark, face_index)
            faces.append(img)
            if debug_faces:
                fn = os.path.join(out_dir, stereo_strip.face_filename(
                    scene_base, camera_name, face_index))
                gimage.store(fn, img, jpeg_quality=settings.jpeg_quality)
                saved.append(fn)
        if len(faces) == 12:
            strip = stereo_strip.assemble_strip(faces)
            fn = os.path.join(out_dir, stereo_strip.strip_filename(
                scene_base, camera_name))
            gimage.store(fn, strip, jpeg_quality=settings.jpeg_quality)
            written.append(fn)
            saved.append(fn)
    return written, saved
