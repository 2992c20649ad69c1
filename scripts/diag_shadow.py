"""Arbiter for the shadow-batch exactness discrepancy.

profile_shadow.py and bench_binned_dense.py both show per-ray occlusion
results changing with ray ORDER (seg-sorted vs sorted; dense-binned vs
sorted) on realistic bounce-1 shadow batches, while random-ray
permutation tests pass.  This script finds the mismatching rays and
verifies each against a host-side numpy Woop test over ALL triangles —
the ground truth that decides which variant is wrong.

Usage: python scripts/diag_shadow.py [--res 256]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    print("backend:", jax.default_backend())
    sb = builtin_scenes.colonnade()
    scene = sb.commit(leaf_size=32)
    pk = scene.packet
    nodes, tris = pk['nodes'], pk['tris']
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

    def cosine_dir(nrm, u1, u2):
        r_ = jnp.sqrt(u1)
        phi = 2 * np.pi * u2
        x = r_ * jnp.cos(phi)
        y = r_ * jnp.sin(phi)
        z = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
        up = jnp.where((jnp.abs(nrm[:, 2]) < 0.9)[:, None],
                       jnp.asarray([0., 0., 1.]),
                       jnp.asarray([1., 0., 0.]))
        tx = jnp.cross(up, nrm)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        ty = jnp.cross(nrm, tx)
        return x[:, None] * tx + y[:, None] * ty + z[:, None] * nrm

    pid = jnp.asarray(order)
    sid = jnp.zeros((n,), jnp.uint32)
    u2p = grng.uniform2(jnp.uint32(9), pid, sid, jnp.uint32(33))
    d1 = cosine_dir(ns, u2p[:, 0], u2p[:, 1])
    o1 = p0 + d1 * 1e-3
    tf1 = jnp.where(valid, jnp.inf, -1.0)
    h1 = ppt.intersect_packet_sorted(nodes, tris, o1, d1, tn, tf1, **skw)
    v1 = h1.tri >= 0
    p1 = o1 + h1.t[:, None] * d1

    lights = [l for l in scene.lights if l['kind'] == 'triangle']
    nl = len(lights)
    os_, ds_, tns, tfs = [], [], [], []
    for li, l in enumerate(lights):
        u2l = grng.uniform2(jnp.uint32(13), pid, sid, jnp.uint32(40 + li))
        su = jnp.sqrt(u2l[:, :1])
        lp = (l['v0'] * (1 - su) + l['v1'] * (su * (1 - u2l[:, 1:]))
              + l['v2'] * (su * u2l[:, 1:]))
        dvec = lp - p1
        dist = jnp.linalg.norm(dvec, axis=-1)
        dd = dvec / jnp.maximum(dist, 1e-6)[:, None]
        os_.append(p1)
        ds_.append(dd)
        tns.append(jnp.full((n,), 1e-3))
        tfs.append(jnp.where(v1, dist - 1e-3, -1.0))
    so = np.asarray(jnp.concatenate(os_))
    sd = np.asarray(jnp.concatenate(ds_))
    stn = np.asarray(jnp.concatenate(tns))
    stf = np.asarray(jnp.concatenate(tfs))
    R = so.shape[0]
    seg = jnp.repeat(jnp.arange(nl, dtype=jnp.uint32), n)

    variants = {}
    variants['unsorted'] = np.asarray(ppt.occluded_packet(
        nodes, tris, jnp.asarray(so), jnp.asarray(sd), jnp.asarray(stn),
        jnp.asarray(stf), **kw))
    variants['sorted'] = np.asarray(ppt.occluded_packet_sorted(
        nodes, tris, jnp.asarray(so), jnp.asarray(sd), jnp.asarray(stn),
        jnp.asarray(stf), **skw))
    variants['seg'] = np.asarray(ppt.occluded_packet_sorted(
        nodes, tris, jnp.asarray(so), jnp.asarray(sd), jnp.asarray(stn),
        jnp.asarray(stf), seg=seg, **skw))
    if 'planes' in pk:
        variants['dense'] = np.asarray(ppt.occluded_dense_binned(
            nodes, tris, pk['planes'], pk['treelet_boxes'],
            pk['treelet_tile_lo'], pk['treelet_tile_hi'],
            jnp.asarray(so), jnp.asarray(sd), jnp.asarray(stn),
            jnp.asarray(stf), rounds=2, rt=8, **skw))

    names = list(variants)
    base = variants['unsorted']
    print("dead rays:", int((stf <= stn).sum()), "of", R)
    union_mismatch = np.zeros(R, bool)
    for nm in names[1:]:
        neq = variants[nm] != base
        print("%-8s vs unsorted: %d mismatches" % (nm, neq.sum()))
        union_mismatch |= neq

    idx = np.nonzero(union_mismatch)[0]
    print("total distinct mismatching rays:", len(idx))
    if len(idx) == 0:
        return

    # host ground truth on the mismatching rays: Moller-Trumbore over
    # every valid triangle
    g = {k: np.asarray(v) for k, v in scene.geom.items()}
    v0, e1, e2 = g['v0'], g['e1'], g['e2']
    valid_t = g['valid'].astype(bool)
    take = idx[:64]
    for i in take[:16]:
        o = so[i].astype(np.float64)
        d = sd[i].astype(np.float64)
        pv = np.cross(np.broadcast_to(d, e2.shape), e2.astype(np.float64))
        det = (e1 * pv).sum(1)
        okd = np.abs(det) > 1e-12
        inv = np.where(okd, 1.0 / np.where(okd, det, 1.0), 0.0)
        tv = o - v0.astype(np.float64)
        u = (tv * pv).sum(1) * inv
        qv = np.cross(tv, e1.astype(np.float64))
        v = (np.broadcast_to(d, qv.shape) * qv).sum(1) * inv
        t = (e2 * qv).sum(1) * inv
        hits = (okd & valid_t & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (t > stn[i]) & (t < stf[i]))
        truth = bool(hits.any())
        row = {nm: bool(variants[nm][i]) for nm in names}
        # distance of nearest hit to the tfar boundary
        tvals = t[hits]
        margin = (float((stf[i] - tvals).min()) if truth else None)
        near = float(t[okd & valid_t & (u >= 0) & (v >= 0)
                       & (u + v <= 1) & (t > stn[i])].min() - stf[i]) \
            if not truth and (okd & valid_t & (u >= 0) & (v >= 0)
                              & (u + v <= 1) & (t > stn[i])).any() else None
        print("ray %7d truth=%s %s tf=%g margin=%s near_miss=%s"
              % (i, truth, row, stf[i], margin, near))
    # aggregate: who agrees with truth most?
    agree = {nm: 0 for nm in names}
    for i in take:
        o = so[i].astype(np.float64)
        d = sd[i].astype(np.float64)
        pv = np.cross(np.broadcast_to(d, e2.shape), e2.astype(np.float64))
        det = (e1 * pv).sum(1)
        okd = np.abs(det) > 1e-12
        inv = np.where(okd, 1.0 / np.where(okd, det, 1.0), 0.0)
        tv = o - v0.astype(np.float64)
        u = (tv * pv).sum(1) * inv
        qv = np.cross(tv, e1.astype(np.float64))
        v = (np.broadcast_to(d, qv.shape) * qv).sum(1) * inv
        t = (e2 * qv).sum(1) * inv
        truth = bool((okd & valid_t & (u >= 0) & (v >= 0) & (u + v <= 1)
                      & (t > stn[i]) & (t < stf[i])).any())
        for nm in names:
            agree[nm] += int(bool(variants[nm][i]) == truth)
    print("agreement with f64 host truth over %d rays: %s"
          % (len(take), agree))


if __name__ == '__main__':
    main()
