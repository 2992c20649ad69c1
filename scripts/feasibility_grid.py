"""Feasibility numbers for a uniform-grid DDA + binned dense sweep path.

Questions it answers (host-side, CPU jax + numpy, no TPU needed):
1. Duplication factor of AABB voxelization at grid resolutions 8/16/32
   (cells per triangle), and per-cell triangle-count distribution.
2. For realistic bounce-1 rays: how many cells does a ray pierce before
   reaching its hit t (== DDA rounds needed with exact termination), and
   the survivor fraction per round.
3. Expected pair-test volume per ray: sum over pierced cells of that
   cell's (128-padded) triangle count — the dense-sweep cost at the
   measured ~20-25 Gpairs/s VPU rate.

Usage: python scripts/feasibility_grid.py [--res 256] [--grid 16]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--grids', type=int, nargs='*', default=[8, 16, 32])
    ap.add_argument('--sample', type=int, default=20000)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.ops import traverse as ops_t
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    sb = builtin_scenes.colonnade()
    scene = sb.commit(leaf_size=32)
    g = {k: np.asarray(v) for k, v in scene.geom.items()}
    v0, e1, e2 = g['v0'], g['e1'], g['e2']
    valid = g['valid'].astype(bool)
    lo = np.asarray(scene.bbox_lo, np.float64)
    hi = np.asarray(scene.bbox_hi, np.float64)
    span = hi - lo
    t_all = v0[valid]
    tmax_ = t_all + np.maximum(e1[valid], 0) * 0  # placeholder
    tri_lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)[valid]
    tri_hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)[valid]
    nt = valid.sum()
    print("tris:", nt)

    for G in args.grids:
        cell = span / G
        ilo = np.clip(((tri_lo - lo) / cell).astype(np.int64), 0, G - 1)
        ihi = np.clip(((tri_hi - lo) / cell).astype(np.int64), 0, G - 1)
        ncell = (ihi - ilo + 1).prod(axis=1)
        counts = np.zeros(G * G * G, np.int64)
        # histogram per cell (loop over tris, vectorized per tri-range is
        # slow in python; use bincount over expanded ids for moderate G)
        dup = ncell.sum()
        # expand (bounded: dup is manageable at G<=32 for 86k tris)
        ids = np.empty(dup, np.int64)
        k = 0
        for t in range(nt):
            xs = np.arange(ilo[t, 0], ihi[t, 0] + 1)
            ys = np.arange(ilo[t, 1], ihi[t, 1] + 1)
            zs = np.arange(ilo[t, 2], ihi[t, 2] + 1)
            n = len(xs) * len(ys) * len(zs)
            cc = ((xs[:, None, None] * G + ys[None, :, None]) * G
                  + zs[None, None, :]).reshape(-1)
            ids[k:k + n] = cc
            k += n
        counts = np.bincount(ids, minlength=G * G * G)
        pad = ((counts + 127) // 128 * 128)
        print("grid %2d^3: dup x%.2f  cells used %d/%d  "
              "tris/cell p50/p90/max %d/%d/%d  padded-total %.1fk "
              "(%.1f MB planes)" % (
                  G, dup / nt, (counts > 0).sum(), G ** 3,
                  np.percentile(counts[counts > 0], 50),
                  np.percentile(counts[counts > 0], 90), counts.max(),
                  pad.sum() / 1e3, pad.sum() * 64 / 1e6))

    # --- bounce-1 ray stats (CPU XLA render path for hits) ---
    w = h = args.res
    n = w * h
    camera = builtin_scenes.colonnade_camera(w, h)
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    hit = ops_t.intersect_bvh(scene.geom, scene.bvh, org, dirn, tn, tf,
                              leaf_size=scene.leaf_size)
    validh = np.asarray(hit.tri) >= 0
    p0 = np.asarray(org + hit.t[:, None] * dirn)
    dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
    ns = np.asarray(dg['Ns'])
    flip = (np.sum(ns * np.asarray(dirn), -1) > 0)
    ns = np.where(flip[:, None], -ns, ns)

    rs = np.random.RandomState(11)
    u1 = rs.rand(n)
    u2 = rs.rand(n)
    r_ = np.sqrt(u1)
    phi = 2 * np.pi * u2
    zax = np.where((np.abs(ns[:, 2]) < 0.9)[:, None],
                   np.array([0., 0., 1.]), np.array([1., 0., 0.]))
    tx = np.cross(zax, ns)
    tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-9)
    ty = np.cross(ns, tx)
    d1 = (r_ * np.cos(phi))[:, None] * tx + (r_ * np.sin(phi))[:, None] \
        * ty + np.sqrt(np.maximum(1 - u1, 0))[:, None] * ns
    o1 = p0 + d1 * 1e-3

    sel = np.nonzero(validh)[0]
    sel = sel[rs.permutation(len(sel))[:args.sample]]
    o1s, d1s = o1[sel], d1[sel]
    h1 = ops_t.intersect_bvh(scene.geom, scene.bvh, jnp.asarray(o1),
                             jnp.asarray(d1), tn,
                             jnp.where(jnp.asarray(validh), jnp.inf, -1.0),
                             leaf_size=scene.leaf_size)
    t1 = np.asarray(h1.t)[sel]

    diag = float(np.linalg.norm(span))
    for G in args.grids:
        cell = span / G
        # DDA march: count cells pierced in [0, min(t_hit, exit)]
        o = o1s - lo[None, :]
        d = d1s.astype(np.float64)
        tcap = np.where(np.isfinite(t1), t1, diag)
        # number of axis crossings = sum over axes of floor-index deltas
        a0 = np.clip((o / cell).astype(np.int64), 0, G - 1)
        pend = o + d * tcap[:, None]
        a1 = np.clip((pend / cell).astype(np.int64), 0, G - 1)
        cells = 1 + np.abs(a1 - a0).sum(axis=1)
        print("grid %2d^3 bounce-1: cells-pierced p50/p90/p99/max = "
              "%d/%d/%d/%d   mean %.2f" % (
                  G, np.percentile(cells, 50), np.percentile(cells, 90),
                  np.percentile(cells, 99), cells.max(), cells.mean()))
        # expected pair volume: mean padded tris over pierced cells
        # (approximate with global mean weighted by usage)

if __name__ == '__main__':
    main()
