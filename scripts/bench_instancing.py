"""Instancing-at-scale measurement (VERDICT r2 #10).

The reference ships two-level instancing DISABLED
(singleray_device.cpp:341; api/scene_instancing.h); scene.py:15-23
documents flattening instead.  This script puts numbers on that
decision at multi-million-triangle scale: 16 translated copies of the
238k-tri sponza_like interior (~3.8M tris flattened), measuring

* host flatten + commit time (the instancing "build" advantage),
* device memory for the packed triangle/BVH tables (the instancing
  "memory" advantage — an instanced build would store one copy: 16x
  less triangle data),
* camera-packet traversal Mrps on the flattened scene (the instancing
  "traversal" question — a two-level BVH pays a top-level round plus
  per-instance ray transforms; flattened pays nothing but memory).

Honest timing: fetch-based syncs, input varied per iteration.

Usage: python scripts/bench_instancing.py [--copies 16] [--res 512]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--copies', type=int, default=16)
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--leaf', type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.scene import SceneBuilder
    from yulio_raytracer_tpu import renderer as _r
    from yulio_raytracer_tpu.cameras import cameras as gcam

    print("backend:", jax.default_backend(), flush=True)

    # base interior, instanced on a 4x4 grid (23 units apart: disjoint)
    base = builtin_scenes.sponza_like()
    t0 = time.perf_counter()
    sb = SceneBuilder()
    sb.textures = base.textures      # materials hold ids into this table
    # traversal-only benchmark: carry materials (texture table untouched)
    # but skip lights and their emissive shapes
    mat_off = {}
    for mi, m in enumerate(base.materials):
        mat_off[mi] = sb.add_material(m)
    import dataclasses
    gx = int(np.ceil(np.sqrt(args.copies)))
    for c in range(args.copies):
        dx, dz = 46.0 * (c % gx), 26.0 * (c // gx)
        xfm = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                          [dx, 0, dz]], np.float32)
        for m in base.meshes:
            if m.light >= 0:
                continue
            mm = m.transformed(xfm)
            sb.add_mesh(dataclasses.replace(
                mm, material=mat_off[m.material]))
    flatten_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    scene = sb.commit(leaf_size=args.leaf)
    commit_s = time.perf_counter() - t0
    ntris = int(scene.packet['tris'].shape[0] * 8)
    tri_mb = scene.packet['tris'].nbytes / 1e6
    node_mb = scene.packet['nodes'].nbytes / 1e6
    print("flattened %d copies: %d tris  flatten %.1fs  commit %.1fs  "
          "tris %.1f MB  nodes %.1f MB  hbm=%s leaf=%d"
          % (args.copies, ntris, flatten_s, commit_s, tri_mb, node_mb,
             scene.packet_hbm, scene.leaf_size), flush=True)

    # camera sweep over the instance field
    w = h = args.res
    n = w * h
    hx = 46.0 * gx / 2
    l2w = gcam.look_at((-30.0, 30.0, -20.0), (hx, 2.0, hx * 0.5),
                       (0.0, 1.0, 0.0))
    camera = gcam.Pinhole(l2w, angle=70.0, aspect=1.0)
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
              use_cull=scene.any_cull)
    nodes, tris = scene.packet['nodes'], scene.packet['tris']

    def run(eps):
        hit = ppt.intersect_packet(nodes, tris, org, dirn, tn + eps, tf,
                                   **kw)
        return np.asarray(hit.t.ravel()[:1])

    run(0.0)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run((i + 1) * 1e-6)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print("camera packet traversal: best %.1f ms  %.2f Mrps"
          % (best * 1e3, n / best / 1e6), flush=True)
    print("instancing would store tris %.1f -> %.1f MB; HBM is 16 GB"
          % (tri_mb, tri_mb / args.copies), flush=True)


if __name__ == '__main__':
    main()
