"""Design simulation for the small-block wavefront traversal kernel.

Models the proposed kernel exactly at the (8,128)-tile-op level for
hit-point-sorted AND octant+Morton-sorted bounce-1 rays:

* blocks of 128 rays (rays in lanes);
* node phase: frontier-of-8 — each round pops up to 8 stack entries and
  tests them against all 128 rays as one (8 nodes x 128 rays) tile op;
  children of any-hit nodes push back (near-first not modeled: the
  closest-hit best-t culling is approximated with the leaf-box t);
* leaf phase: each visited leaf sweeps ceil(count/8) rows as
  (8 tris x 128 rays) tile ops.

Prints tile-ops/ray (node + leaf) and the projected Mrps at the
measured ~26 Gpair/s dense rate (1 tile op == 1024 pair-slots), vs the
current 1024-packet kernel's measured 182 ms / 262k.

Usage: python scripts/diag_smallblock.py [--res 512] [--blocks 24]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def block_cost(nodes, o, d, tn, tf, frontier: int = 8):
    """(node_rounds, leaf_rows, node_pops) for one ray block under the
    frontier-of-8 discipline with optimistic best-t leaf culling."""
    import numpy as np
    inv = 1.0 / np.where(np.abs(d) > 1e-30, d, 1e-30)
    best = np.where(tf > tn, np.inf, -np.inf)
    stack = [0]
    node_rounds = 0
    node_pops = 0
    leaf_rows = 0
    leaf_list = []
    while stack:
        batch = [stack.pop() for _ in range(min(frontier, len(stack)))]
        node_rounds += 1
        node_pops += len(batch)
        for i in batch:
            lo, hi = nodes[i, :3], nodes[i, 3:6]
            t0 = (lo[None] - o) * inv
            t1 = (hi[None] - o) * inv
            near = np.maximum(np.minimum(t0, t1).max(1), tn)
            far = np.minimum(np.maximum(t0, t1).min(1),
                             np.minimum(tf, best))
            hitm = near <= far
            if not hitm.any():
                continue
            tag = nodes[i, 7]
            if tag < 0:
                stack.append(int(nodes[i, 6]))
                stack.append(i + 1)
            else:
                # no best-t culling modeled (conservative upper bound,
                # same convention as diag_union.py)
                leaf_rows += (int(tag) + 7) // 8
    return node_rounds, leaf_rows, node_pops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=512)
    ap.add_argument('--blocks', type=int, default=24)
    ap.add_argument('--leaf', type=int, default=32)
    ap.add_argument('--bsize', type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend(), flush=True)
    scene = builtin_scenes.colonnade().commit(leaf_size=args.leaf)
    pk = scene.packet
    nodes, tris = pk['nodes'], pk['tris']
    nodes_np = np.asarray(nodes).reshape(-1, 8)
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
              use_cull=scene.any_cull)

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

    key = ppt._ray_sort_key(o1, d1, scene.bbox_lo, scene.bbox_hi)
    orders = {
        'hitpoint-morton': np.asarray(ppt.hitpoint_sort_perm(
            o1, scene.bbox_lo, scene.bbox_hi, live=tf1 > 0)),
        'octant+morton': np.asarray(jnp.argsort(key)),
    }
    o1h = np.asarray(o1, np.float64)
    d1h = np.asarray(d1, np.float64)
    tnh = np.asarray(tn, np.float64)
    tfh = np.asarray(tf1, np.float64)

    rs = np.random.RandomState(0)
    g = args.bsize
    for name, perm in orders.items():
        oo, dd = o1h[perm], d1h[perm]
        tt, ff = tnh[perm], tfh[perm]
        tot = np.zeros(3)
        used = 0
        for _ in range(args.blocks):
            s = rs.randint(0, n // g) * g
            sel = slice(s, s + g)
            live = ff[sel] > 0
            if not live.any():
                continue
            used += 1
            nr, lr, npop = block_cost(nodes_np, oo[sel][live],
                                      dd[sel][live], tt[sel][live],
                                      ff[sel][live])
            tot += (nr, lr, npop)
        tot /= max(used, 1)
        node_r, leaf_r, pops = tot
        ops_per_block = node_r + leaf_r          # (8,128) tile ops
        slots_per_ray = ops_per_block * 1024 / g
        # measured dense rate: 26.3 Gpair-slots/s
        ns_per_ray = slots_per_ray / 26.3
        print("%-16s bsize %4d: node rounds %6.1f  leaf rows %6.1f  "
              "pops %6.1f  -> slots/ray %6.0f  ~%5.0f ns/ray  ~%4.1f Mrps"
              % (name, g, node_r, leaf_r, pops, slots_per_ray,
                 ns_per_ray, 1000.0 / ns_per_ray), flush=True)


if __name__ == '__main__':
    main()
