"""Analytic primitive tessellation (sphere / disk / single triangle).

Replicates the reference's host-side triangulation so scenes using
`<Sphere>` / `<Disk>` XML tags produce identical geometry:
`shapes/sphere.h:51-87` (lat-long grid, pole handling, normals from the
parametric derivative cross product) and `shapes/disk.h`.
"""
from __future__ import annotations

import numpy as np

from .mesh import HostMesh


def _sphere_eval(theta, phi):
    return np.stack([np.sin(theta) * np.cos(phi),
                     np.cos(theta),
                     np.sin(theta) * np.sin(phi)], axis=-1)


def tessellate_sphere(center, radius, num_theta: int, num_phi: int,
                      **mesh_kw) -> HostMesh:
    """Mirror of Sphere::triangulate (shapes/sphere.h:51-87)."""
    center = np.asarray(center, np.float32)
    positions, normals, texcoords, tris = [], [], [], []
    for it in range(num_theta + 1):
        th = it * np.pi / num_theta
        for ip in range(num_phi):
            ph = ip * 2.0 * np.pi / num_phi
            p = _sphere_eval(th, ph)
            dpdu = _sphere_eval((it + 0.001) * np.pi / num_theta, ph) - p
            dpdv = _sphere_eval(th, (ip + 0.001) * 2.0 * np.pi / num_phi) - p
            positions.append(radius * p + center)
            n = np.cross(dpdv, dpdu)
            normals.append(n / max(np.linalg.norm(n), 1e-20))
            texcoords.append([ip / num_phi, it / num_theta])
        if it == 0:
            continue
        for ip in range(1, num_phi + 1):
            p00 = (it - 1) * num_phi + ip - 1
            p01 = (it - 1) * num_phi + ip % num_phi
            p10 = it * num_phi + ip - 1
            p11 = it * num_phi + ip % num_phi
            if it > 1:
                tris.append([p10, p00, p01])
            if it < num_theta:
                tris.append([p11, p10, p01])
    return HostMesh(np.asarray(positions, np.float32),
                    np.asarray(tris, np.int32),
                    np.asarray(normals, np.float32),
                    np.asarray(texcoords, np.float32), **mesh_kw)


def tessellate_disk(center, normal, radius, num_phi: int = 64,
                    **mesh_kw) -> HostMesh:
    """Fan-triangulated disk (shapes/disk.h)."""
    center = np.asarray(center, np.float32)
    n = np.asarray(normal, np.float64)
    n = n / max(np.linalg.norm(n), 1e-20)
    # frame
    h = np.eye(3)[np.argmin(np.abs(n))]
    dx = np.cross(h, n)
    dx /= max(np.linalg.norm(dx), 1e-20)
    dy = np.cross(n, dx)
    positions = [center]
    texcoords = [[0.5, 0.5]]
    tris = []
    for ip in range(num_phi):
        ph = ip * 2.0 * np.pi / num_phi
        positions.append(center + radius * (np.cos(ph) * dx + np.sin(ph) * dy))
        texcoords.append([0.5 + 0.5 * np.cos(ph), 0.5 + 0.5 * np.sin(ph)])
        tris.append([0, 1 + ip, 1 + (ip + 1) % num_phi])
    normals = np.repeat(n[None, :], len(positions), axis=0)
    return HostMesh(np.asarray(positions, np.float32),
                    np.asarray(tris, np.int32),
                    normals.astype(np.float32),
                    np.asarray(texcoords, np.float32), **mesh_kw)


def single_triangle(v0, v1, v2, **mesh_kw) -> HostMesh:
    pos = np.asarray([v0, v1, v2], np.float32)
    return HostMesh(pos, np.asarray([[0, 1, 2]], np.int32), **mesh_kw)


def quad(v0, v1, v2, v3, **mesh_kw) -> HostMesh:
    """Two-triangle quad (used by TriangleLight::createShape for quadlights)."""
    pos = np.asarray([v0, v1, v2, v3], np.float32)
    return HostMesh(pos, np.asarray([[0, 1, 2], [0, 2, 3]], np.int32), **mesh_kw)
