"""Benchmark driver: renders the benchmark scenes on the available device
and prints one JSON line per metric.

Metrics (each its own JSON line, headline LAST):
* cornell_512_mrps   — small-scene path (512x512, 32 spp, depth 4): the
  fused dense Pallas intersector regime.
* stereo_face_1536_mrps — the production render configuration's load
  shape (YulioRT.h:38-41: 1536^2 faces, depth 10, tMaxShadowRay 120) on
  the large scene, measured at reduced spp (the full 256 spp face is the
  same compiled step run more times).
* colonnade_1024_mrps — the north-star regime (BASELINE.json: Sponza-
  scale scene, 1024x1024, 64 spp): BVH packet traversal + wavefront ray
  binning.  Measured at 8 spp (same step, more passes at 64).

Mrays/s is measured the reference's way — rays traced / wall seconds,
steady state (integratorrenderer.cpp:101-111, scripts/benchmark.py:360).
vs_baseline divides by the north star's per-chip share: >= 100 Mrays/s
on a v5e-8 => 12.5 Mrays/s/chip (BASELINE.md:16).

Regression-grade reporting (VERDICT r4 next #4): every Mrays/s metric
is the MEDIAN of >= 3 timed frames (different seeds, dedup-proof), with
"min"/"max"/"repeats" fields so tunnel noise is distinguishable from a
real regression, "compile_s" = the warmup call's wall (cold compile +
first dispatch; ~0 when the persistent compile cache is warm), and —
for the deep production regimes — "live_fraction" = live lanes /
dispatched lanes across the wavefront (the dead-lane utilization the
compaction work targets; 1.0 would mean zero dead work).
"""
import json

from yulio_raytracer_tpu.utils import hostmem

hostmem.tune_malloc()

BASELINE_MRPS_PER_CHIP = 12.5
# device-init watchdog: a healthy tunneled backend can take minutes to
# hand out the axon grant (a killed process holds it ~8 min), but an
# outage hangs jax.devices() indefinitely — bound it so the driver gets
# a diagnostic line instead of a silent hang
DEVICE_INIT_TIMEOUT_S = 900


def _ensure_device():
    """Initialize the jax backend on a watchdog thread; hard-exit with
    one JSON diagnostic line if the tunnel never answers."""
    import os
    import threading
    got = {}
    done = threading.Event()

    def _init():
        try:
            import jax
            got['devices'] = [str(d) for d in jax.devices()]
        except Exception as e:         # immediate init failure: report it
            got['error'] = repr(e)
        finally:
            done.set()

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    done.wait(DEVICE_INIT_TIMEOUT_S)
    if 'devices' not in got:
        detail = got.get('error') or (
            "jax.devices() did not answer within %ds - axon tunnel "
            "down?" % DEVICE_INIT_TIMEOUT_S)
        print(json.dumps({
            "metric": "device_unavailable",
            "value": 0,
            "unit": "error",
            "vs_baseline": 0,
            "detail": detail,
        }), flush=True)
        os._exit(1)
    print("# devices: %s" % got['devices'], flush=True)
PSNR_TARGET_DB = 40.0       # BASELINE.md:16 hardware-parity acceptance


def bench_tpu_psnr():
    """TPU-vs-CPU hardware parity: render the pinned golden config on
    the live device and PSNR it against the committed CPU reference
    render (assets/golden/cornell_64_cpu.npz, seed 42, 32 spp).  The
    BASELINE.md acceptance metric demands >= 40 dB."""
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.film import accum

    golden = np.load(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'assets', 'golden',
        'cornell_64_cpu.npz'))['img']
    scene = builtin_scenes.cornell_box().commit()
    cam = builtin_scenes.cornell_camera(64, 64)
    film, _ = renderer.render_frame(scene, cam, pt.PTParams(max_depth=4),
                                    64, 64, spp=32, seed=42)
    img = np.asarray(accum.resolve(film))
    mse = float(((img - golden) ** 2).mean())
    psnr = 10.0 * np.log10(max(float(golden.max()), 1e-9) ** 2
                           / max(mse, 1e-20))
    return psnr


def _timed_frames(scene, camera, params, w, h, spp, repeats: int = 3,
                  live_fraction: bool = False):
    """Warmup (compile) + `repeats` timed frames with distinct seeds.
    Returns (median FrameStats, extras dict with min/max/compile_s
    [/live_fraction])."""
    import time
    from yulio_raytracer_tpu import renderer

    t0 = time.perf_counter()
    renderer.render_frame(scene, camera, params, w, h, spp=spp, seed=0)
    compile_s = time.perf_counter() - t0
    runs = []
    width = live = 0
    for seed in range(1, 1 + repeats):
        stats_list = [] if (live_fraction and seed == 1) else None
        _, st = renderer.render_frame(scene, camera, params, w, h,
                                      spp=spp, seed=seed,
                                      bounce_stats=stats_list)
        runs.append(st)
        if stats_list:
            width = sum(e['width'] for e in stats_list)
            live = sum(e['live'] for e in stats_list)
    runs.sort(key=lambda s: s.mrps)
    med = runs[len(runs) // 2]
    # frame_s/mray make WALL-TIME movement first-class: a chunking
    # change can cut frame seconds while barely moving (or dipping)
    # Mrps when it also removes padded duplicate rays from the
    # numerator (round 5: the compacted-path budget fix cut the stereo
    # face 25.2 s -> 18.5 s while Mrps dipped 4% because the old
    # chunking traced 30% duplicate rays — see README)
    extras = {"min": round(runs[0].mrps, 3),
              "max": round(runs[-1].mrps, 3),
              "repeats": repeats,
              "compile_s": round(compile_s, 1),
              "frame_s": round(med.seconds, 2),
              "mray": round(med.num_rays / 1e6, 1)}
    if width:
        extras["live_fraction"] = round(live / width, 4)
    return med, extras


def bench_cornell():
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt

    scene = builtin_scenes.cornell_box().commit()
    camera = builtin_scenes.cornell_camera(512, 512)
    params = pt.PTParams(max_depth=4)
    stats, extras = _timed_frames(scene, camera, params, 512, 512, spp=32)
    return "cornell_512_mrps", stats, extras


def bench_colonnade():
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt

    scene = builtin_scenes.colonnade().commit(leaf_size=32)
    camera = builtin_scenes.colonnade_camera(1024, 1024)
    params = pt.PTParams(max_depth=4)
    stats, extras = _timed_frames(scene, camera, params, 1024, 1024,
                                  spp=8)
    return "colonnade_1024_mrps", stats, extras


def bench_colonnade_traversal():
    """Coherent packet-traversal throughput: full-frame closest-hit
    passes at 1024^2 over the Sponza-scale scene (tiled ray order) — the
    rtcIntersect-equivalent Embree number."""
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu import renderer as _r
    from yulio_raytracer_tpu.renderer import FrameStats

    scene = builtin_scenes.colonnade().commit(leaf_size=32)
    w = h = 1024
    camera = builtin_scenes.colonnade_camera(w, h)
    order = _r._tile_order(w, h)
    n = w * h
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn = jnp.zeros((n,))
    tf = jnp.full((n,), jnp.inf)
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm)
    nodes, tris = scene.packet['nodes'], scene.packet['tris']

    # honest timing (scripts/bench_incoherent.py rules): sync by
    # FETCHING (block_until_ready is a no-op on the tunneled backend),
    # vary the input per iteration so backend execution dedup can't
    # replay a cached answer, and amortize the ~30 ms RPC floor over K
    # in-jit input-varied passes (a 1024^2 coherent pass runs ~22 ms —
    # below the floor — so un-amortized numbers time the RPC, not the
    # kernel)
    K = 8

    @jax.jit
    def loop(e0):
        def body(i, acc):
            hit = ppt.intersect_packet(
                nodes, tris, org, dirn,
                tn + e0 + i.astype(jnp.float32) * 1e-7, tf, **kw)
            return acc + jnp.sum(jnp.minimum(hit.t, jnp.float32(1e9)))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    np.asarray(loop(jnp.float32(0.0)).ravel()[:1])      # compile + warm
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(jnp.float32((i + 1) * 1e-5)).ravel()[:1])
        times.append(time.perf_counter() - t0)
    # key carries the "amortized" semantics (ADVICE r3): K in-jit
    # input-varied passes per fetch, min-of-3 — NOT comparable to the
    # pre-r3 per-call `colonnade_traversal_mrps` numbers
    return "colonnade_traversal_amortized_mrps", FrameStats(K * n, min(times))


def bench_stereo_face():
    """One production cube face: the REAL StereoCube camera (eye offset,
    falloff, head rotation — not a pinhole stand-in) at the YulioRT.h
    production config's load shape.  All 12 faces share one compiled
    graph (traced face index), so face 1 is representative.  Reduced
    spp is also representative: measured flat across spp 2/4/8
    (3.68/3.66/3.66 Mrps, 2026-08-18) — per-pass overhead is
    negligible, so the full 256-spp face runs at the same rate."""
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu.cameras import cameras as cam

    scene = builtin_scenes.colonnade().commit(leaf_size=32)
    l2w = cam.look_at((-9.0, 2.2, 0.0), (10.0, 1.6, 0.0), (0.0, 1.0, 0.0))
    rig = cam.make_stereo_rig(l2w, scene_scale=0.05)
    camera = rig[1]                    # right-face, left eye
    params = pt.PTParams(max_depth=10, t_max_shadow_ray=120.0)
    stats, extras = _timed_frames(scene, camera, params, 1536, 1536,
                                  spp=2, live_fraction=True)
    return "stereo_face_1536_mrps", stats, extras


def bench_tpu_psnr_glass():
    """Same hardware-parity gate on the dielectric/medium golden scene
    (glass sphere + textured floor + ambient dome — the reference's
    models/sphere_glass.xml structure): exercises refraction, Beer-law
    media and texture filtering on the live device."""
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.film import accum

    golden = np.load(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'assets', 'golden',
        'sphere_glass_64_cpu.npz'))['img']
    scene = builtin_scenes.sphere_glass().commit()
    cam = builtin_scenes.sphere_glass_camera(64, 64)
    film, _ = renderer.render_frame(scene, cam, pt.PTParams(max_depth=8),
                                    64, 64, spp=32, seed=42)
    img = np.asarray(accum.resolve(film))
    mse = float(((img - golden) ** 2).mean())
    return 10.0 * np.log10(max(float(golden.max()), 1e-9) ** 2
                           / max(mse, 1e-20))


def _path_psnr(scene_fn, cam_fn, depth, spp, golden, commit_kw=None,
               check=None, **params_kw):
    """On-chip parity gate for one traversal path: render a pinned
    small config on the live device through the given path and PSNR it
    against the CPU oracle (assets/golden/*, scripts/make_goldens.py —
    the XLA non-Pallas path, same deterministic sample sequences, so
    any gap is kernel numerics, not variance).  The determinism
    property SURVEY §4 pins (integratorrenderer.cpp:134)."""
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.film import accum

    ref = np.load(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'assets', 'golden', golden))['img']
    scene = getattr(builtin_scenes, scene_fn)().commit(**(commit_kw or {}))
    if check:
        check(scene)
    cam = getattr(builtin_scenes, cam_fn)(64, 64)
    film, _ = renderer.render_frame(
        scene, cam, pt.PTParams(max_depth=depth, **params_kw),
        64, 64, spp=spp, seed=42)
    img = np.asarray(accum.resolve(film))
    mse = float(((img - ref) ** 2).mean())
    return 10.0 * np.log10(max(float(ref.max()), 1e-9) ** 2
                           / max(mse, 1e-20))


def bench_psnr_hbm():
    """HBM-streamed packet path (238k-tri sponza_like: packed rows
    exceed TRIS_VMEM_LIMIT_BYTES, so leaf windows DMA from HBM)."""
    def check(scene):
        assert scene.packet_hbm, "sponza_like must exceed the VMEM limit"
    return _path_psnr('sponza_like', 'sponza_like_camera', 2, 4,
                      'sponza_64_cpu.npz', dict(leaf_size=32), check)


def bench_psnr_grid():
    """Uniform-grid DDA bounce-regrouping path (ray_binning='grid')."""
    def check(scene):
        assert 'grid' in scene.packet, "colonnade must carry grid tables"
    return _path_psnr('colonnade', 'colonnade_camera', 3, 8,
                      'colonnade_64_cpu.npz', dict(leaf_size=32), check,
                      ray_binning='grid')


def bench_psnr_treelet():
    """Treelet-binned bounce-regrouping path (ray_binning='treelet')."""
    def check(scene):
        assert 'treelet_roots' in scene.packet
    return _path_psnr('colonnade', 'colonnade_camera', 3, 8,
                      'colonnade_64_cpu.npz', dict(leaf_size=32), check,
                      ray_binning='treelet')


def bench_psnr_motion():
    """Motion-blur packet path (union-bounds BVH + time-aware MT)."""
    def check(scene):
        assert scene.packet is not None and 'tris_mb' in scene.packet, \
            "motion_field must commit the motion packet tables"
    return _path_psnr('motion_field', 'motion_field_camera', 2, 16,
                      'motion_64_cpu.npz', {}, check)


def bench_psnr_stereo():
    """StereoCube ray-generation path (traced face index, eye offset,
    vertical falloff, head rotation) on the live device vs the CPU
    oracle — guards the one-graph-for-12-faces camera."""
    return _path_psnr('cornell_box', 'cornell_stereo_camera', 2, 8,
                      'stereo_64_cpu.npz', {})


def bench_sponza():
    """Texture-heavy Sponza-class regime (238k tris, 20 textures,
    1024x1024): texture-atlas gather cost at scale."""
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt

    scene = builtin_scenes.sponza_like().commit(leaf_size=32)
    camera = builtin_scenes.sponza_like_camera(1024, 1024)
    params = pt.PTParams(max_depth=4)
    stats, extras = _timed_frames(scene, camera, params, 1024, 1024,
                                  spp=8)
    return "sponza_like_1024_mrps", stats, extras


def bench_incoherent_utilization():
    """Kernel-utilization line (VERDICT r4 next #4): achieved tri-pair
    test rate inside the full traversal kernel on the bounce-1 sorted
    population, against the 26.3 Gpairs/s standalone VPU ceiling
    (README 'Incoherent-traversal roofline').  Regression-tracks the
    MFU-style number the roofline writeups lean on: value = Gpairs/s,
    vs_baseline = fraction of the ceiling.  Pairs/ray comes from the
    kernel's own counters (tri-rows x 8 per packet, debug_counts)."""
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    from yulio_raytracer_tpu.ops import intersect as ops_i
    from yulio_raytracer_tpu.core import rng as grng
    from yulio_raytracer_tpu import renderer as _r

    scene = builtin_scenes.colonnade().commit(leaf_size=32)
    nodes, tris = scene.packet['nodes'], scene.packet['tris']
    kw = dict(max_leaf=scene.leaf_size, hbm=scene.packet_hbm,
              use_cull=scene.any_cull)
    w = h = 512
    n = w * h
    camera = builtin_scenes.colonnade_camera(w, h)
    order = _r._tile_order(w, h)
    px = jnp.asarray((order % w).astype(np.float32))
    py = jnp.asarray((order // w).astype(np.float32))
    uv = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    org, dirn = camera.ray(uv, jnp.zeros((n, 2)))
    tn, tf = jnp.zeros((n,)), jnp.full((n,), jnp.inf)

    @jax.jit
    def bounce1(e):
        """Primary hit -> cosine-scattered bounce rays, PRESORTED by
        the wavefront key (so the timed kernel call needs no sort)."""
        hit = ppt.intersect_packet(nodes, tris, org, dirn, tn + e, tf,
                                   **kw)
        valid = hit.tri >= 0
        p0 = org + hit.t[:, None] * dirn
        dg = ops_i.post_intersect(scene.geom, org, dirn, hit)
        ns = dg['Ns']
        ns = jnp.where((jnp.sum(ns * dirn, -1) > 0)[:, None], -ns, ns)
        u2 = grng.uniform2(jnp.uint32(9), jnp.asarray(order),
                           jnp.zeros((n,), jnp.uint32), jnp.uint32(33))
        r_ = jnp.sqrt(u2[:, 0])
        phi = 2 * np.pi * u2[:, 1]
        upv = jnp.where((jnp.abs(ns[:, 2]) < 0.9)[:, None],
                        jnp.asarray([0., 0., 1.]), jnp.asarray([1., 0., 0.]))
        tx = jnp.cross(upv, ns)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        ty = jnp.cross(ns, tx)
        d1 = ((r_ * jnp.cos(phi))[:, None] * tx
              + (r_ * jnp.sin(phi))[:, None] * ty
              + jnp.sqrt(jnp.maximum(1 - u2[:, 0], 0.0))[:, None] * ns)
        o1 = p0 + d1 * 1e-3
        tf1 = jnp.where(valid, jnp.inf, -1.0)
        key = ppt._ray_sort_key(o1, d1, jnp.asarray(scene.bbox_lo),
                                jnp.asarray(scene.bbox_hi))
        key = key | ((~valid).astype(jnp.uint32) << jnp.uint32(30))
        perm = jnp.argsort(key)
        return o1[perm], d1[perm], tf1[perm]

    o1, d1, tf1 = bounce1(jnp.float32(0.0))

    @jax.jit
    def counted(o, d, tfr):
        hit, counts = ppt.intersect_packet(nodes, tris, o, d,
                                           jnp.zeros((n,)), tfr,
                                           debug_counts=True, **kw)
        return hit.t, counts

    @jax.jit
    def plain(o, d, tfr, e):
        return ppt.intersect_packet(nodes, tris, o, d,
                                    jnp.zeros((n,)) + e, tfr, **kw).t

    _, counts = counted(o1, d1, tf1)
    counts = np.asarray(counts)                 # fetch = sync
    pairs = float(counts[:, 3].sum()) * 8.0 * ppt.BLOCK
    np.asarray(plain(o1, d1, tf1, jnp.float32(0.0)).ravel()[:1])  # warm
    rates = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(plain(o1, d1, tf1,
                         jnp.float32((i + 1) * 1e-6)).ravel()[:1])
        rates.append(pairs / (time.perf_counter() - t0) / 1e9)
    rates.sort()
    return rates[1], {"min": round(rates[0], 2),
                      "max": round(rates[2], 2),
                      "pairs_per_ray": round(pairs / n, 1),
                      "ceiling_gpairs": 26.3}


def main():
    # Persistent compile cache: MUST go through jax.config.update — the
    # axon sitecustomize imports jax at interpreter startup, so setting
    # JAX_COMPILATION_CACHE_DIR from inside this file is too late (the
    # config already materialized with the cache disabled; round-4's
    # cold numbers silently recompiled everything every process).
    from yulio_raytracer_tpu.utils import compile_cache
    compile_cache.enable("/root/.cache/jax_comp")
    _ensure_device()
    for name, fn in (("cornell_tpu_vs_cpu_psnr", bench_tpu_psnr),
                     ("sphere_glass_tpu_vs_cpu_psnr",
                      bench_tpu_psnr_glass),
                     ("hbm_stream_tpu_vs_cpu_psnr", bench_psnr_hbm),
                     ("grid_path_tpu_vs_cpu_psnr", bench_psnr_grid),
                     ("treelet_path_tpu_vs_cpu_psnr", bench_psnr_treelet),
                     ("motion_packet_tpu_vs_cpu_psnr", bench_psnr_motion),
                     ("stereo_camera_tpu_vs_cpu_psnr", bench_psnr_stereo)):
        psnr = fn()
        print(json.dumps({
            "metric": name,
            "value": round(psnr, 2),
            "unit": "dB",
            "vs_baseline": round(psnr / PSNR_TARGET_DB, 4),
        }), flush=True)
    gp, gp_extras = bench_incoherent_utilization()
    print(json.dumps({
        "metric": "incoherent_kernel_utilization_gpairs",
        "value": round(gp, 2),
        "unit": "Gpairs/s",
        "vs_baseline": round(gp / 26.3, 4),
        **gp_extras,
    }), flush=True)
    for fn in (bench_cornell, bench_colonnade_traversal,
               bench_sponza, bench_stereo_face, bench_colonnade):
        out = fn()
        metric, stats = out[0], out[1]
        extras = out[2] if len(out) > 2 else {}
        print(json.dumps({
            "metric": metric,
            "value": round(stats.mrps, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(stats.mrps / BASELINE_MRPS_PER_CHIP, 4),
            **extras,
        }), flush=True)


if __name__ == '__main__':
    main()
