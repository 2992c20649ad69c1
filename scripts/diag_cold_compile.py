"""Where does the cold first-render compile go? (VERDICT r4 next #6)

Runs a first render against a FRESH persistent-cache dir (the shared
cache untouched) with compile logging on, and prints a timeline of
every XLA compile (module name + wall) plus the commit / first-frame /
steady-frame split.  The attribution drives the cold-start work: if a
handful of Mosaic kernel modules dominate, parallel AOT prewarm pays;
if one monolithic chunk module dominates, splitting the module is the
lever.

Usage: python scripts/diag_cold_compile.py [--scene cornell_box]
           [--res 128] [--spp 16] [--depth 2] [--force-bvh]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', type=str, default='cornell_box')
    ap.add_argument('--res', type=int, default=128)
    ap.add_argument('--spp', type=int, default=16)
    ap.add_argument('--depth', type=int, default=2)
    ap.add_argument('--force-bvh', action='store_true')
    ap.add_argument('--accel', type=str, default='default')
    args = ap.parse_args()

    import jax
    tmp = tempfile.mkdtemp(prefix='jaxcache_cold_')
    jax.config.update('jax_compilation_cache_dir', tmp)
    jax.config.update('jax_explain_cache_misses', False)
    print("fresh cache:", tmp, flush=True)

    # timeline hook: jax logs each backend compile start at DEBUG on
    # jax._src.dispatch/interpreters; simplest robust hook is timing
    # pxla's cached compile call.
    import jax._src.interpreters.pxla  # noqa: F401
    from jax._src import compiler as _jc
    compiles = []
    orig = _jc.compile_or_get_cached

    def _mod_name(a):
        for x in a:
            try:
                return str(x.operation.attributes['sym_name'])
            except Exception:
                continue
        return '?'

    def timed_compile(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        dt = time.perf_counter() - t0
        name = _mod_name(a)[:70]
        compiles.append((dt, name))
        print("  [compile] %7.1f s  %s" % (dt, name), flush=True)
        return out

    _jc.compile_or_get_cached = timed_compile

    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    t0 = time.perf_counter()
    kw = dict(accel=args.accel)
    if args.force_bvh:
        kw['force_bvh'] = True
    scene = getattr(builtin_scenes, args.scene)().commit(**kw)
    t_commit = time.perf_counter() - t0
    cam_fn = getattr(builtin_scenes, args.scene + '_camera', None)
    camera = (cam_fn or builtin_scenes.cornell_camera)(args.res, args.res)
    params = pt.PTParams(max_depth=args.depth)
    t0 = time.perf_counter()
    _, st1 = renderer.render_frame(scene, camera, params, args.res,
                                   args.res, spp=args.spp, seed=0)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, st2 = renderer.render_frame(scene, camera, params, args.res,
                                   args.res, spp=args.spp, seed=1)
    t_steady = time.perf_counter() - t0
    tot = sum(c[0] for c in compiles)
    print("\ncommit %.1f s | first frame %.1f s | steady %.1f s "
          "(%.2f Mrps)" % (t_commit, t_first, t_steady, st2.mrps),
          flush=True)
    print("compiles: %d modules, %.1f s total (%.0f%% of first frame)"
          % (len(compiles), tot, 100.0 * tot / max(t_first, 1e-9)),
          flush=True)
    for dt, name in sorted(compiles, reverse=True)[:10]:
        print("  %7.1f s  %s" % (dt, name), flush=True)


if __name__ == '__main__':
    main()
