"""Camera models: pinhole, depth-of-field, stereoscopic cube-map.

Vectorized ray generation over pixel batches.  Conventions match the
reference exactly:

* lookAt frame (affinespace.h:73-78): Z = normalize(point - eye),
  U = normalize(cross(up, Z)), V = normalize(cross(Z, U)).
* PinHoleCamera (pinholecamera.h:30-41): pixel2world built from fov/aspect;
  dir = normalize(px * vx + (1-py) * vy + vz).
* DepthOfFieldCamera (depthoffieldcamera.h): lens-disk origin jitter with
  focal plane at focalDistance.
* StereoCubeCamera (StereoCubeCamera.h, Yulio): 6 GearVR-compatible face
  matrices (up/down faces double-flipped, :42-65), per-pixel horizontal
  angle theta rotating the eye about the head axis, vertical stereo
  falloff beyond `stereFalloffAngle` (:128-144), optional toe-in
  convergence at the zero-parallax distance (:152-156).  Eye separation
  defaults 6.35cm * 0.393701 scaled by sceneScale (:7-8, :29-31).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as vm
from ..sampling import shapesampler as ss

EYE_SEPARATION = 6.35 * 0.393701          # StereoCubeCamera.h:7
ZERO_PARALLAX = EYE_SEPARATION * 30.0     # StereoCubeCamera.h:8


def look_at(eye, point, up):
    """AffineSpace3f::lookAtPoint -> (4,3) affine [vx;vy;vz;p]."""
    eye = jnp.asarray(eye, jnp.float32)
    z = vm.normalize(jnp.asarray(point, jnp.float32) - eye)
    u = vm.normalize(vm.cross(jnp.asarray(up, jnp.float32), z))
    v = vm.normalize(vm.cross(z, u))
    return jnp.stack([u, v, z, eye])


def _pixel2world(local2world, angle_deg, aspect):
    l2w = local2world
    w = vm.xfm_vector(l2w, jnp.asarray(
        [-0.5 * aspect, -0.5,
         0.5 / np.tan(np.deg2rad(0.5 * angle_deg))], jnp.float32))
    return jnp.stack([aspect * l2w[0], l2w[1], w, l2w[3]])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Pinhole:
    local2world: jnp.ndarray
    angle: float = field(metadata=dict(static=True), default=64.0)
    aspect: float = field(metadata=dict(static=True), default=1.0)

    def ray(self, pixel, sample):
        """pixel: (R, 2) in [0,1]^2; sample unused. -> (org, dir) (R, 3)."""
        p2w = _pixel2world(self.local2world, self.angle, self.aspect)
        d = (pixel[:, 0:1] * p2w[0] + (1.0 - pixel[:, 1:2]) * p2w[1]
             + p2w[2])
        org = jnp.broadcast_to(p2w[3], d.shape)
        return org, vm.normalize(d)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DepthOfField:
    local2world: jnp.ndarray
    angle: float = field(metadata=dict(static=True), default=64.0)
    aspect: float = field(metadata=dict(static=True), default=1.0)
    lens_radius: float = field(metadata=dict(static=True), default=0.0)
    focal_distance: float = field(metadata=dict(static=True), default=1.0)

    def ray(self, pixel, sample):
        p2w = _pixel2world(self.local2world, self.angle, self.aspect)
        # normalize focal distance by the central ray length
        # (depthoffieldcamera.h:29-31)
        fd = self.focal_distance / jnp.linalg.norm(
            0.5 * p2w[0] + 0.5 * p2w[1] + p2w[2])
        lens = ss.uniform_sample_disk(sample, self.lens_radius)
        begin = vm.xfm_point(self.local2world, jnp.concatenate(
            [lens, jnp.zeros_like(lens[..., :1])], axis=-1))
        end = p2w[3] + fd * (pixel[:, 0:1] * p2w[0]
                             + (1.0 - pixel[:, 1:2]) * p2w[1] + p2w[2])
        return begin, vm.normalize(end - begin)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StereoCube:
    """One of the 12 per-viewpoint cameras (6 faces x 2 eyes).

    cube_face_index: 0..11; face = index % 6 in order front, right, back,
    left, up, down; index < 6 = left eye (-0.5 offset), else right eye.
    """
    local2world: jnp.ndarray
    # a DATA field (traced), not static: all 12 per-viewpoint cameras
    # share ONE compiled render graph (the reference pays zero compile
    # cost; baking the face index as a constant recompiled the full
    # pipeline 12x per stereo render)
    cube_face_index: int = 0
    origin: Optional[jnp.ndarray] = None
    up: tuple = field(metadata=dict(static=True), default=(0.0, 1.0, 0.0))
    scene_scale: float = field(metadata=dict(static=True), default=1.0)
    eye_separation: float = field(metadata=dict(static=True),
                                  default=EYE_SEPARATION)
    zero_parallax: float = field(metadata=dict(static=True),
                                 default=ZERO_PARALLAX)
    toe_in: bool = field(metadata=dict(static=True), default=False)
    falloff_angle: float = field(metadata=dict(static=True), default=30.0)

    def _faces(self):
        l2w = self.local2world
        aspect = 1.0
        angle = 90.0
        origin = (self.origin if self.origin is not None else l2w[3])
        up = jnp.asarray(self.up, jnp.float32)
        w = vm.xfm_vector(l2w, jnp.asarray(
            [-0.5 * aspect, -0.5,
             0.5 / np.tan(np.deg2rad(0.5 * angle))], jnp.float32))
        front = jnp.stack([aspect * l2w[0], l2w[1], w, l2w[3]])

        def rot(axis, deg, m):
            return vm.affine_compose(
                vm.affine_rotate(origin, axis, jnp.float32(np.deg2rad(deg))),
                m)

        faces = [front,
                 rot(up, 90.0, front),
                 rot(up, 180.0, front),
                 rot(up, -90.0, front)]
        # `right = cross(normalize(up), normalize(lookAt - origin))`
        # (StereoCubeCamera.h:28); the forward axis is local2world's vz
        rightv = vm.cross(vm.normalize(up), vm.normalize(l2w[2]))
        up_face = rot(up, 180.0, rot(rightv, -90.0, front))
        down_face = rot(up, 180.0, rot(rightv, 90.0, front))
        faces += [up_face, down_face]
        return faces, front, origin, up

    def ray(self, pixel, sample):
        """StereoCubeCamera::ray (StereoCubeCamera.h:68-161), batched.

        The face index is a traced value: both the side-face and the
        up/down-face angle formulas run and a mask selects per ray, so
        one compiled graph serves all 12 cameras.  The selected values
        are the same elementwise formulas as the per-face branches; the
        unselected branch may produce NaN (normalize of a zero vector at
        the exact face center) which jnp.where discards."""
        faces, front, origin, up = self._faces()
        idx = jnp.asarray(self.cube_face_index, jnp.int32)
        face = idx % 6
        p2w = jnp.stack(faces)[face]
        px = pixel[:, 0]
        ypix = 1.0 - pixel[:, 1]
        fvx, fvy, fvz = front[0], front[1], front[2]
        xyz_straight = vm.normalize(0.5 * fvx + 0.5 * fvy + fvz)

        def sign(x):
            return jnp.where(x < 0.0, -1.0, 1.0)

        # side faces (0-3): horizontal/vertical angles off the face center
        xdir = vm.normalize(px[:, None] * fvx + 0.5 * fvy + fvz)
        theta_side = jnp.arccos(jnp.clip(vm.dot(xdir, xyz_straight),
                                         -1, 1)) * sign(px - 0.5)
        ydir = vm.normalize(0.5 * fvx + ypix[:, None] * fvy + fvz)
        yang = jnp.rad2deg(jnp.arccos(
            jnp.clip(vm.dot(ydir, xyz_straight), -1, 1))) \
            * sign(ypix - 0.5)
        abs_vert_side = jnp.abs(yang)

        # up/down faces (4, 5): head rotation from the in-face 2D angle
        xy = jnp.stack([px - 0.5, ypix - 0.5, jnp.zeros_like(px)],
                       axis=-1)
        xyn = vm.normalize(xy)
        xy_up = jnp.where(face == 4,
                          jnp.asarray([0.0, -1.0, 0.0]),
                          jnp.asarray([0.0, 1.0, 0.0]))
        theta_tb = jnp.arccos(jnp.clip(vm.dot(xyn, xy_up), -1, 1)) \
            * sign(px - 0.5)
        xyzdir = vm.normalize(px[:, None] * fvx
                              + ypix[:, None] * fvy + fvz)
        xyzang = jnp.rad2deg(jnp.arccos(
            jnp.clip(vm.dot(xyzdir, xyz_straight), -1, 1)))
        abs_vert_tb = 90.0 - jnp.abs(xyzang)

        is_side = face < 4
        theta = jnp.where(is_side, theta_side, theta_tb)
        abs_vert = jnp.where(is_side, abs_vert_side, abs_vert_tb)

        # effective eye separation with vertical stereo falloff (:127-144)
        eye_sep = self.eye_separation * self.scene_scale
        zero_par = self.zero_parallax * self.scene_scale
        eye_off = eye_sep * jnp.where(idx < 6, -0.5, 0.5)
        fall = 1.0 - vm.smoothstep(
            0.0, 1.0, vm.smoothstep(self.falloff_angle, 90.0, abs_vert))
        eye_off = jnp.where(abs_vert > self.falloff_angle,
                            eye_off * fall, eye_off)

        # translate the camera matrix by the eye offset (:142-143):
        # p2w * translate((eyeOff, 0, 0)) only changes p by eyeOff * vx
        p_eye = p2w[3] + eye_off[:, None] * p2w[0]

        # rotate the eye position about the head axis by theta (:147-150)
        u = vm.normalize(up)
        ray_origin = origin + vm.rotate_about_axis(p_eye - origin, u, theta)

        vx, vy, vz = p2w[0], p2w[1], p2w[2]
        if self.toe_in and zero_par != 0.0:
            # toe-in correction (:152-156): rotate the view matrix about
            # the up axis through the eye by -atan(eyeOff / zeroParallax)
            corr = -jnp.arctan(eye_off / zero_par)
            vxb = jnp.broadcast_to(vx, ray_origin.shape)
            vyb = jnp.broadcast_to(vy, ray_origin.shape)
            vzb = jnp.broadcast_to(vz, ray_origin.shape)
            vx = vm.rotate_about_axis(vxb, u, corr)
            vy = vm.rotate_about_axis(vyb, u, corr)
            vz = vm.rotate_about_axis(vzb, u, corr)
        d = px[:, None] * vx + ypix[:, None] * vy + vz

        return ray_origin, vm.normalize(d)


def make_stereo_rig(local2world, origin=None, up=(0, 1, 0), scene_scale=1.0,
                    eye_separation=EYE_SEPARATION, zero_parallax=ZERO_PARALLAX,
                    toe_in=False, falloff_angle=30.0):
    """The 12 StereoCubeCameras the Collada loader creates per viewpoint
    (ColladaLoader.cpp:480-498)."""
    return [StereoCube(local2world, i, origin, tuple(up), scene_scale,
                       eye_separation, zero_parallax, toe_in, falloff_angle)
            for i in range(12)]
