"""Permutation-invariance repro for the any-hit packet kernel.

occluded_packet's per-ray result must not depend on how rays are grouped
into packets.  profile_shadow.py measured `seg exactness: False` on TPU —
this isolates whether that's an interpret-reproducible kernel bug, a
compiled-only (Mosaic) bug, or an HBM-DMA bug.

Usage: python scripts/repro_perm.py [--tpu] [--hbm] [--closest]
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tpu', action='store_true')
    ap.add_argument('--hbm', action='store_true')
    ap.add_argument('--closest', action='store_true')
    ap.add_argument('--n', type=int, default=8192)
    args = ap.parse_args()
    if not args.tpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt

    print("backend:", jax.default_backend())
    scene = builtin_scenes.colonnade().commit(leaf_size=32)
    nodes, tris = scene.packet['nodes'], scene.packet['tris']
    hbm = args.hbm or scene.packet_hbm
    kw = dict(max_leaf=scene.leaf_size, hbm=hbm,
              use_cull=scene.any_cull, interpret=not args.tpu)
    print("tris %d hbm %s cull %s" % (scene.num_triangles, hbm,
                                      scene.any_cull))

    rs = np.random.RandomState(7)
    n = args.n
    lo = np.asarray(scene.bbox_lo)
    hi = np.asarray(scene.bbox_hi)
    org = jnp.asarray((rs.rand(n, 3) * (hi - lo) + lo).astype(np.float32))
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((n,), 1e-3)
    diag = float(np.linalg.norm(hi - lo))
    tf = jnp.asarray((rs.rand(n) * diag).astype(np.float32))
    # some dead lanes like real NEE batches
    tf = tf.at[::7].set(-1.0)

    def run_occ(o, dd, t0, t1):
        return ppt.occluded_packet(nodes, tris, o, dd, t0, t1, **kw)

    def run_hit(o, dd, t0, t1):
        h = ppt.intersect_packet(nodes, tris, o, dd, t0, t1, **kw)
        return h.tri

    run = run_hit if args.closest else run_occ
    base = np.asarray(run(org, d, tn, tf))
    bad = 0
    for trial in range(6):
        perm = rs.permutation(n)
        out = np.asarray(run(org[perm], d[perm], tn[perm], tf[perm]))
        # compare in original ray order
        unperm = np.empty(n, np.int64)
        unperm[perm] = np.arange(n)
        got = out[unperm]
        neq = (got != base)
        if neq.any():
            bad += 1
            idx = np.nonzero(neq)[0][:5]
            print("trial %d MISMATCH %d rays, e.g. %s base=%s got=%s"
                  % (trial, neq.sum(), idx.tolist(),
                     base[idx].tolist(), got[idx].tolist()))
        else:
            print("trial %d ok" % trial)
    print("RESULT:", "FAIL" if bad else "PASS")


if __name__ == '__main__':
    main()
