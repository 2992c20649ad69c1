"""Profile the grid path's round internals on TPU.

STALE TIMING -- pre-correction diagnostic: syncs with
`jax.block_until_ready`, a NO-OP on the tunneled axon backend
(README "Measurement correction"), so ms/Mrps columns report
dispatch, not execution.  Kept for the ray-population/kernel
construction; for trustworthy numbers use
scripts/bench_incoherent.py (fetch-synced, input-varied).

Times each piece of a DDA round in isolation (layout, ranges, sweep,
gathers, DDA step) and tracks per-round live/remaining counts, to find
where the ~40 ms/round and the ~200 ms fallback actually go.

Usage: python scripts/profile_grid.py [--res 512]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--rt', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import pallas_pairs as ppp
    from yulio_raytracer_tpu.ops import grid as gridm
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r
    from yulio_raytracer_tpu.scene import GRID_RES

    print("backend:", jax.default_backend())
    scene = builtin_scenes.colonnade().commit(leaf_size=32)
    pk = scene.packet
    nodes, tris = pk['nodes'], pk['tris']
    gd = pk['grid']
    res = GRID_RES
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
              use_cull=scene.any_cull)
    skw = dict(bbox_lo=scene.bbox_lo, bbox_hi=scene.bbox_hi, **kw)

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
    hit = ppt.intersect_packet(nodes, tris, org, dirn, tn, tf, **kw)
    valid = hit.tri >= 0
    p0 = org + hit.t[:, None] * dirn
    dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
    ns = dg['Ns']
    ns = jnp.where((jnp.sum(ns * dirn, -1) > 0)[:, None], -ns, ns)
    pid = jnp.asarray(order)
    sid = jnp.zeros((n,), jnp.uint32)
    u2p = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(33))
    r_ = jnp.sqrt(u2p[:, 0])
    phi = 2 * np.pi * u2p[:, 1]
    up = jnp.where((jnp.abs(ns[:, 2]) < 0.9)[:, None],
                   jnp.asarray([0., 0., 1.]), jnp.asarray([1., 0., 0.]))
    tx = jnp.cross(up, ns)
    tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
    ty = jnp.cross(ns, tx)
    d1 = ((r_ * jnp.cos(phi))[:, None] * tx
          + (r_ * jnp.sin(phi))[:, None] * ty
          + jnp.sqrt(jnp.maximum(1 - u2p[:, 0], 0.0))[:, None] * ns)
    o1 = p0 + d1 * 1e-3
    tf1 = jnp.where(valid, jnp.inf, -1.0)

    def timeit(label, fn, iters=5):
        r = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
        print("%-40s %8.2f ms" % (label, (time.perf_counter() - t0)
                                  / iters * 1e3))
        return r

    # ---- step-by-step round 1 state ----
    ci, tnext, tdelta, step, t0, inside = gridm._dda_init(
        gd['grid_lo'], gd['grid_hi'], res, o1, d1, tn)
    live = inside & (tf1 > tn) & (t0 <= tf1)
    entry = t0
    best = jnp.full((n,), gridm.INF)
    bound = jnp.minimum(tf1, best)
    act = live & (entry <= bound)
    cid = gridm._cell_id(ci, res)
    print("round-1 active:", int(jnp.sum(act)), "of", n)

    rt = args.rt
    block = ppp.RB * rt
    ncell = res ** 3
    cap = n + ncell * block
    cap = (cap + block * 8 - 1) // (block * 8) * (block * 8)

    layout = jax.jit(lambda cid, act, o, d, tn_, tf_:
                     ppt._binned_layout(cid, act, o, d, tn_, tf_, ncell,
                                        (0., 0., 0.), (1., 1., 1.),
                                        block=block, align=block * 8))
    out = timeit("layout (scatter-free)", lambda: layout(
        cid, act, o1, d1, tn, jnp.where(act, tf1, -1.0)))
    slot, org_p, dirn_p, tn_p, tf_p, seg_offs = out

    ranges = jax.jit(lambda so: ppt._dense_ranges(
        so, gd['cell_tile_lo'], gd['cell_tile_hi'], cap, block))
    gs, ge = timeit("dense ranges", lambda: ranges(seg_offs))
    spans = np.asarray(ge) - np.asarray(gs)
    print("   blocks:", len(spans), " nonzero:", int((spans > 0).sum()),
          " tile-span sum:", int(spans.sum()),
          " mean nonzero span:", float(spans[spans > 0].mean()))

    sweep = jax.jit(partial_sweep := (lambda op, dp, tnp_, tfp_, gs, ge:
                    ppp.intersect_pairs_raw(
                        gd['planes'], op, dp, tnp_, tfp_, gs=gs, ge=ge,
                        rt=rt, use_cull=scene.any_cull)))
    timeit("ranged sweep kernel", lambda: sweep(org_p, dirn_p, tn_p,
                                                tf_p, gs, ge))

    # full-range reference: what would sweeping EVERYTHING cost
    timeit("one dda step", lambda: gridm._dda_step(ci, tnext, tdelta,
                                                   step, res))

    full = jax.jit(lambda: gridm.intersect_grid(
        gd, nodes, tris, o1, d1, tn, tf1, rounds=4, rt=rt, res=res,
        **skw))
    timeit("intersect_grid rounds=4 total", lambda: full(), iters=3)

    # ---- live/remaining per round (host loop, python) ----
    ci_, tnext_, tdelta_, step_, t0_, inside_ = gridm._dda_init(
        gd['grid_lo'], gd['grid_hi'], res, o1, d1, tn)
    live_ = inside_ & (tf1 > tn) & (t0_ <= tf1)
    entry_ = t0_
    best_t = jnp.full((n,), gridm.INF)
    for k in range(16):
        bound = jnp.minimum(tf1, best_t)
        act = live_ & (entry_ <= bound)
        n_act = int(jnp.sum(act))
        cid = gridm._cell_id(ci_, res)
        t_s, i_s = gridm._sweep(gd, cid, act, o1, d1, tn, bound, res,
                                rt, scene.any_cull, False)
        better = t_s < best_t
        best_t = jnp.where(better, t_s, best_t)
        ci_, tnext_, entry_, inside_ = gridm._dda_step(
            ci_, tnext_, tdelta_, step_, res)
        live_ = live_ & inside_
        rem = int(jnp.sum(live_ & (entry_ <= jnp.minimum(tf1, best_t))))
        print("after round %2d: active %7d  remaining %7d  hits %7d"
              % (k + 1, n_act, rem, int(jnp.sum(best_t < gridm.INF))))
        if rem == 0:
            break


if __name__ == '__main__':
    main()
