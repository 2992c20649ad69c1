"""Honest primitive-rate measurements: the design constants every
traversal plan rests on.

CRITICAL measurement rule (discovered round 3): on the tunneled axon
backend `jax.block_until_ready` returns without waiting for execution
(a 64x tanh-matmul chain "finishes" in 0.03 ms = 41 PFLOP/s).  Every
timing MUST fetch at least one element of the result to host
(`np.asarray(r[...])`), which forces completion and adds one measurable
RPC round-trip (reported separately as `rpc floor`).  Round-2 numbers
taken via block_until_ready (traversal Mrps, Gpairs/s ceilings, regroup
costs) are unreliable; full-render numbers fetched the film and stand.

Measures:
* RPC round-trip floor (fetch of a tiny ready array)
* dense pair-test rate (pallas_pairs outer product), full + ranged
* XLA argsort / gather / scatter cost per element
"""
import argparse
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def fetch(r):
    """Force completion of r (array or tuple thereof) via a host fetch."""
    import numpy as np
    if isinstance(r, (tuple, list)):
        r = r[0]
    return np.asarray(r.ravel()[:1])


def timeit(label, fn, work, unit, iters=4):
    fetch(fn(0))
    times = []
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        fetch(fn(i))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print("%-38s best %9.2f ms   %10.2f %s" % (
        label, best * 1e3, work / best / 1e9, unit), flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rays', type=int, default=1 << 18)
    ap.add_argument('--tris', type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from yulio_raytracer_tpu.ops import pallas_pairs as ppp

    print("backend:", jax.default_backend(), flush=True)
    rs = np.random.RandomState(0)
    r, t = args.rays, args.tris

    # RPC round-trip floor: fetch 4 bytes of an already-ready array
    ready = jnp.zeros((8,), jnp.float32)
    fetch(ready)
    floors = []
    for _ in range(8):
        t0 = time.perf_counter()
        fetch(ready)
        floors.append(time.perf_counter() - t0)
    print("%-38s best %9.2f ms" % ("rpc fetch floor", min(floors) * 1e3),
          flush=True)

    # synthetic woop planes
    host = {
        'ng': rs.randn(t, 3).astype(np.float32),
        'cull': np.zeros(t, np.float32),
    }
    woop = rs.randn(4, 3 * t).astype(np.float32)
    planes, rows = ppp.pack_planes(woop, host)
    planes = jnp.asarray(planes)
    org = jnp.asarray(rs.randn(r, 3).astype(np.float32))
    dirn = jnp.asarray(rs.randn(r, 3).astype(np.float32))
    tn = jnp.zeros((r,))
    tf = jnp.full((r,), np.inf)

    gt = planes.shape[0]
    npairs = r * gt * ppp.TL

    timeit("dense pairs full sweep (%d x %d)" % (r, gt * 128),
           lambda i: ppp.intersect_pairs_raw(
               planes, org, dirn, tn + i * 1e-6, tf)[0],
           npairs, "Gpairs/s")

    # ranged sweep: each 64-ray block sweeps 2 tiles
    nblk = r // 64
    gs = jnp.asarray((np.arange(nblk) * 2) % max(gt - 2, 1),
                     dtype=jnp.int32)
    ge = gs + 2
    timeit("dense pairs ranged (2 tiles/block)",
           lambda i: ppp.intersect_pairs_raw(
               planes, org, dirn, tn + i * 1e-6, tf, gs=gs, ge=ge)[0],
           r * 2 * 128, "Gpairs/s")

    # XLA regroup primitives
    keys = jnp.asarray(rs.randint(0, 1 << 30, size=r).astype(np.uint32))
    timeit("argsort u32 (%dk)" % (r // 1000),
           lambda i: jnp.argsort(keys + jnp.uint32(i)), r, "Gelem/s")
    perm = jnp.argsort(keys)
    vals = jnp.asarray(rs.randn(r, 3).astype(np.float32))
    timeit("gather rows (R,3)",
           lambda i: (vals + i)[perm], r, "Gelem/s")
    timeit("scatter rows .at[perm].set",
           lambda i: jnp.zeros_like(vals).at[perm].set(vals + i),
           r, "Gelem/s")

    # pallas dispatch floor: 1-tile ranged sweep per block
    ge1 = gs + 1
    timeit("dense pairs ranged (1 tile/block)",
           lambda i: ppp.intersect_pairs_raw(
               planes, org, dirn, tn + i * 1e-6, tf, gs=gs, ge=ge1)[0],
           r * 1 * 128, "Gpairs/s")


if __name__ == '__main__':
    main()
