"""Watertightness probe: count leaked misses for rays aimed exactly at
shared edges / shared vertices / closed-surface interiors, across the
three triangle-test implementations (brute MT, Woop MXU, packet kernel).

RTC_SCENE_ROBUST parity question (scene_flat.h:94): Embree's robust mode
promises no missed hits at grazing incidence and edge crossings.  Each
case here constructs rays where a NON-watertight test can miss all
incident triangles:

  quad-diag   rays through points exactly on the shared diagonal of a
              two-triangle quad (axis-aligned + oblique)
  vertex-fan  rays through the shared center vertex of a triangle fan
  cube-edges  rays from a closed cube's center toward its corners, edge
              midpoints and points sampled on edges (any miss = leak
              out of a closed surface)
  sliver      grazing rays down the long axis of near-degenerate slivers

Usage: python scripts/diag_watertight.py
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def pad_rays(org, dirn, block):
    n = len(org)
    m = -(-n // block) * block
    o = np.zeros((m, 3), np.float32)
    d = np.tile(np.float32([[0, 0, 1]]), (m, 1))
    o[:n] = org
    d[:n] = dirn
    return o, d, n


def main():
    import jax.numpy as jnp
    from yulio_raytracer_tpu.geometry import mesh, bvh, primitives
    from yulio_raytracer_tpu.ops import intersect, pallas_traverse as ppt

    def build(meshes):
        packed = mesh.pack_meshes(meshes, pad_multiple=64)
        tree = bvh.build(packed.v0, packed.e1, packed.e2, packed.valid,
                         leaf_size=8)
        host = {k: getattr(packed, k) for k in (
            'v0', 'e1', 'e2', 'ng', 'vn', 'uv', 'mat_id', 'light_id',
            'cull', 'illum_mask', 'shadow_mask', 'valid')}
        host = bvh.permute_geom(host, tree.order)
        woop = mesh.woop_matrices(host['v0'], host['e1'], host['e2'],
                                  host['valid'])
        host['woop'] = woop
        nodes = jnp.asarray(ppt.pack_nodes(tree))
        tris = jnp.asarray(ppt.pack_tris(woop, host))
        geom = {k: jnp.asarray(v) for k, v in host.items()}
        return nodes, tris, geom

    def mt_f64(meshes, org, dirn):
        """f64 Möller–Trumbore with inclusive boundaries (eps slop): the
        'should hit' oracle — any ray it hits that an f32 path misses is
        a leak, not a genuine miss."""
        packed = mesh.pack_meshes(meshes, pad_multiple=64)
        val = packed.valid
        v0 = packed.v0[val].astype(np.float64)
        e1 = packed.e1[val].astype(np.float64)
        e2 = packed.e2[val].astype(np.float64)
        o = org.astype(np.float64)[:, None]
        d = dirn.astype(np.float64)[:, None]
        eps = 1e-12
        p = np.cross(d, e2[None])
        det = (e1[None] * p).sum(-1)
        inv = np.where(np.abs(det) > 1e-300, 1.0 / det, 0.0)
        tv = o - v0[None]
        u = (tv * p).sum(-1) * inv
        q = np.cross(tv, e1[None])
        v = (d * q).sum(-1) * inv
        t = (e2[None] * q).sum(-1) * inv
        ok = ((np.abs(det) > 0) & (u >= -eps) & (v >= -eps)
              & (u + v <= 1 + eps) & (t > 1e-9))
        return ok.any(-1)

    def misses(meshes, org, dirn, tmax=None):
        nodes, tris, geom = build(meshes)
        o, d, n = pad_rays(org, dirn, ppt.BLOCK)
        tn = jnp.zeros((len(o),))
        tf = (jnp.full((len(o),), np.inf) if tmax is None
              else jnp.asarray(np.full(len(o), tmax, np.float32)))
        hb = intersect.intersect_brute(geom, jnp.asarray(o), jnp.asarray(d),
                                       tn, tf, block=64)
        hw = intersect.intersect_woop(geom, jnp.asarray(o), jnp.asarray(d),
                                      tn, tf, block=64)
        hp = ppt.intersect_packet(nodes, tris, jnp.asarray(o),
                                  jnp.asarray(d), tn, tf, max_leaf=8,
                                  interpret=True)
        should = mt_f64(meshes, org, dirn)
        out = [int((~should).sum())]
        for h in (hb, hw, hp):
            miss = ~np.isfinite(np.asarray(h.t)[:n])
            out.append(int((miss & should).sum()))
        return out, n

    results = {}

    # ---- case 1: quad shared diagonal --------------------------------
    quad = primitives.quad([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0])
    s = np.linspace(0.001, 0.999, 2000).astype(np.float32)
    # straight down through (s, s, 0) — exactly on the diagonal y = x
    org_v = np.stack([s, s, np.ones_like(s)], -1)
    dir_v = np.tile(np.float32([[0, 0, -1]]), (len(s), 1))
    # oblique: from a fixed off-axis origin through the same points
    o2 = np.float32([-0.7, 0.31, 1.3])
    p = np.stack([s, s, np.zeros_like(s)], -1)
    dv = p - o2
    dv /= np.linalg.norm(dv, axis=1, keepdims=True)
    org_o = np.tile(o2, (len(s), 1)).astype(np.float32)
    results['quad-diag vertical'], n1 = misses([quad], org_v, dir_v)
    results['quad-diag oblique'], n2 = misses([quad], org_o, dv)

    # ---- case 2: vertex fan ------------------------------------------
    c = np.float32([0.3, 0.7, 0.0])
    K = 12
    ang = np.linspace(0, 2 * np.pi, K + 1)
    rim = np.stack([c[0] + np.cos(ang), c[1] + np.sin(ang),
                    np.zeros(K + 1)], -1).astype(np.float32)
    fan = [primitives.single_triangle(c, rim[i], rim[i + 1])
           for i in range(K)]
    # rays exactly through the shared vertex, from varied origins
    rs = np.random.RandomState(3)
    orgs = (rs.randn(512, 3) * 2 + np.float32([0, 0, 3])).astype(np.float32)
    orgs[:, 2] = np.abs(orgs[:, 2]) + 0.5
    dirs = c[None] - orgs
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    results['vertex-fan'], n3 = misses(fan, orgs, dirs)

    # ---- case 3: closed cube, rays at corners/edges ------------------
    lo, hi = np.float32(-1.0), np.float32(1.0)
    v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi)
                  for z in (lo, hi)], np.float32)
    faces = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    tris_idx = []
    for a, b, cc, dd in faces:
        tris_idx += [(a, b, cc), (a, cc, dd)]
    cube = mesh.HostMesh(v, np.asarray(tris_idx, np.int32))
    edges = set()
    for t in tris_idx:
        for i in range(3):
            e = tuple(sorted((t[i], t[(i + 1) % 3])))
            edges.add(e)
    targets = [v[a] * (1 - w) + v[b] * w
               for a, b in sorted(edges)
               for w in np.linspace(0, 1, 64, dtype=np.float32)]
    targets = np.asarray(targets, np.float32)
    dirs = targets / np.linalg.norm(targets, axis=1, keepdims=True)
    orgs = np.zeros_like(dirs)
    results['cube-edges'], n4 = misses([cube], orgs, dirs)
    # random directions from inside (global no-escape property)
    rd = rs.randn(8192, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    results['cube-random'], n5 = misses([cube], np.zeros_like(rd), rd)

    # ---- case 4: slivers, grazing down the long axis -----------------
    slivers = []
    for i in range(8):
        y = np.float32(i * 0.01)
        slivers.append(primitives.single_triangle(
            [0, y, 0], [100.0, y + 1e-4, 0], [0, y + 1e-4, 1e-3]))
    m = 1024
    oy = rs.uniform(0, 0.08, m).astype(np.float32)
    oz = rs.uniform(0, 1e-3, m).astype(np.float32)
    org = np.stack([np.full(m, -1.0, np.float32), oy, oz], -1)
    dirn = np.tile(np.float32([[1, 0, 0]]), (m, 1))
    # aim through a sliver point mid-way
    px = rs.uniform(10, 90, m).astype(np.float32)
    tgt = np.stack([px, oy + 5e-5, oz * 0.5], -1)
    dv = tgt - org
    dv /= np.linalg.norm(dv, axis=1, keepdims=True)
    results['sliver-grazing'], n6 = misses(slivers, org, dv)

    ns = dict(zip(results, (n1, n2, n3, n4, n5, n6)))
    print("%-20s %6s %7s | leaks: %8s %8s %8s" % (
        "case", "rays", "f64miss", "bruteMT", "woop", "packet"))
    for k, (m64, mb, mw, mp) in results.items():
        print("%-20s %6d %7d | %8d %8d %8d" % (k, ns[k], m64, mb, mw, mp))


if __name__ == '__main__':
    main()
