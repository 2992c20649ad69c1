import numpy as np
import jax.numpy as jnp

from yulio_raytracer_tpu.scene import SceneBuilder
from yulio_raytracer_tpu.geometry.mesh import HostMesh
from yulio_raytracer_tpu.shading import materials as gmat
from yulio_raytracer_tpu.lights import lights as glights
from yulio_raytracer_tpu.integrator import pathtracer as pt
from yulio_raytracer_tpu.cameras import cameras as cam
from yulio_raytracer_tpu.io import builtin_scenes
from yulio_raytracer_tpu import renderer
from yulio_raytracer_tpu.film import accum


def _floor(material, size=1000.0, y=0.0):
    pos = np.asarray([[-size, y, -size], [size, y, -size],
                      [size, y, size], [-size, y, size]], np.float32)
    tri = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    nrm = np.tile([[0.0, 1.0, 0.0]], (4, 1)).astype(np.float32)
    return HostMesh(pos, tri, nrm, material=material)


def _down_rays(n, height=5.0):
    rs = np.random.RandomState(0)
    org = np.zeros((n, 3), np.float32)
    org[:, 0] = rs.uniform(-5, 5, n)
    org[:, 2] = rs.uniform(-5, 5, n)
    org[:, 1] = height
    d = np.tile([[0.0, -1.0, 0.0]], (n, 1)).astype(np.float32)
    return jnp.asarray(org), jnp.asarray(d)


def _ids(n):
    return (jnp.arange(n, dtype=jnp.uint32), jnp.zeros((n,), jnp.uint32))


def test_env_only():
    """No geometry: every ray escapes to the ambient light exactly."""
    sb = SceneBuilder()
    sb.add_light(glights.ambient((0.3, 0.6, 0.9)))
    scene = sb.commit()
    n = 64
    org, d = _down_rays(n, height=5.0)
    # point rays up so they never hit the (empty) scene
    pid, sid = _ids(n)
    L, nrays = pt.trace(scene, pt.PTParams(max_depth=2), org, -d,
                        0, pid, sid)
    np.testing.assert_allclose(np.asarray(L),
                               np.tile([[0.3, 0.6, 0.9]], (n, 1)), atol=1e-6)


def test_ambient_floor_analytic():
    """Matte floor under a uniform dome: NEE with cosine light sampling is
    zero-variance -> every sample == albedo * L exactly (depth 2: the GI
    bounce escapes but ignore_vl suppresses env double-count)."""
    sb = SceneBuilder()
    m = sb.add_material(gmat.make_material('matte',
                                           {'reflectance': (0.6, 0.4, 0.2)}))
    sb.add_mesh(_floor(m))
    sb.add_light(glights.ambient((1.0, 1.0, 1.0)))
    scene = sb.commit()
    n = 256
    org, d = _down_rays(n)
    pid, sid = _ids(n)
    L, _ = pt.trace(scene, pt.PTParams(max_depth=2), org, d, 0, pid, sid)
    np.testing.assert_allclose(np.asarray(L),
                               np.tile([[0.6, 0.4, 0.2]], (n, 1)), atol=1e-3)


def test_point_light_inverse_square():
    """Point light: L = I * rho/pi * cos / d^2 analytically."""
    sb = SceneBuilder()
    m = sb.add_material(gmat.make_material('matte', {'reflectance': 0.5}))
    sb.add_mesh(_floor(m))
    light_pos = np.asarray([0.0, 2.0, 0.0])
    sb.add_light(glights.point(light_pos, (10.0, 10.0, 10.0)))
    scene = sb.commit()
    n = 128
    org, d = _down_rays(n)
    pid, sid = _ids(n)
    L, _ = pt.trace(scene, pt.PTParams(max_depth=2), org, d, 0, pid, sid)
    hitp = np.array(org, copy=True)
    hitp[:, 1] = 0.0
    dvec = light_pos - hitp
    dist2 = (dvec ** 2).sum(1)
    cos = dvec[:, 1] / np.sqrt(dist2)
    expect = 10.0 * 0.5 / np.pi * cos / dist2
    np.testing.assert_allclose(np.asarray(L)[:, 0], expect, rtol=1e-3)


def test_mirror_reflects_environment():
    """Specular bounce keeps env visible (ignore_vl only set for diffuse)."""
    sb = SceneBuilder()
    m = sb.add_material(gmat.make_material('mirror',
                                           {'reflectance': (0.8, 0.8, 0.8)}))
    sb.add_mesh(_floor(m))
    sb.add_light(glights.ambient((1.0, 1.0, 1.0)))
    scene = sb.commit()
    n = 64
    org, d = _down_rays(n)
    pid, sid = _ids(n)
    L, _ = pt.trace(scene, pt.PTParams(max_depth=3), org, d, 0, pid, sid)
    np.testing.assert_allclose(np.asarray(L), 0.8, atol=1e-4)


def test_shadowing():
    """An occluder between the floor and a point light casts a shadow."""
    sb = SceneBuilder()
    m = sb.add_material(gmat.make_material('matte', {'reflectance': 0.5}))
    sb.add_mesh(_floor(m))
    # small blocker quad right under the light
    blocker = _floor(m, size=0.5, y=1.0)
    sb.add_mesh(blocker)
    sb.add_light(glights.point((0.0, 2.0, 0.0), (10.0, 10.0, 10.0)))
    scene = sb.commit()
    org = jnp.asarray([[0.0, 5.0, 0.0], [3.0, 5.0, 0.0]])  # shadowed, lit
    # start rays off-axis so they don't hit the blocker
    org = jnp.asarray([[0.1, 0.5, 0.1], [3.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    pid, sid = _ids(2)
    L, _ = pt.trace(scene, pt.PTParams(max_depth=2), org, d, 0, pid, sid)
    l = np.asarray(L)
    assert l[0, 0] == 0.0        # under the blocker: fully shadowed
    assert l[1, 0] > 0.0         # outside: lit


def test_tmax_shadow_ray_dome_trick():
    """With a finite tMaxShadowRay, occluders beyond the cap stop blocking
    (the Yulio fake-ambient trick, pathtraceintegrator.cpp:148-157)."""
    sb = SceneBuilder()
    m = sb.add_material(gmat.make_material('matte', {'reflectance': 0.5}))
    sb.add_mesh(_floor(m, size=1000.0))            # floor at y=0
    sb.add_mesh(_floor(m, size=1000.0, y=50.0))    # "ceiling" far above
    sb.add_light(glights.ambient((1.0, 1.0, 1.0)))
    scene = sb.commit()
    n = 128
    org, d = _down_rays(n, height=5.0)
    pid, sid = _ids(n)
    # without cap: dome fully occluded by the ceiling -> only GI, which at
    # depth 2 is suppressed by ignore_vl -> nearly black
    L0, _ = pt.trace(scene, pt.PTParams(max_depth=2), org, d, 0, pid, sid)
    # with a 10-unit cap: shadow rays stop before the ceiling -> lit
    L1, _ = pt.trace(scene, pt.PTParams(max_depth=2, t_max_shadow_ray=10.0,
                                        t_max_shadow_jitter=0.0),
                     org, d, 0, pid, sid)
    assert float(jnp.mean(L0)) < 0.01
    assert float(jnp.mean(L1)) > 0.4


def test_glass_sphere_energy():
    """Rays through a glass slab keep carrying energy (refraction path)."""
    sb = SceneBuilder()
    g = sb.add_material(gmat.make_material('glass', {'etaInside': 1.5}))
    m = sb.add_material(gmat.make_material('matte', {'reflectance': 0.8}))
    # closed glass slab (two interfaces, so the eta^2 radiance-compression
    # factors of enter/exit cancel) above a white floor
    sb.add_mesh(_floor(g, size=2.0, y=2.0))
    sb.add_mesh(_floor(g, size=2.0, y=1.9))
    sb.add_mesh(_floor(m, size=50.0))
    sb.add_light(glights.ambient((1.0, 1.0, 1.0)))
    scene = sb.commit()
    n = 512
    org, d = _down_rays(n, height=5.0)
    org = org.at[:, 0].set(jnp.linspace(-1.5, 1.5, n))
    org = org.at[:, 2].set(0.0)
    pid, sid = _ids(n)
    L, _ = pt.trace(scene, pt.PTParams(max_depth=6), org, d, 0, pid, sid)
    mean = float(jnp.mean(L))
    assert 0.3 < mean < 1.0  # light passes through, some fresnel loss


def test_cornell_box_smoke():
    """64x64 Cornell render: GI color bleeding + emissive light patch."""
    scene = builtin_scenes.cornell_box().commit()
    camera = builtin_scenes.cornell_camera(64, 64)
    film, stats = renderer.render_frame(
        scene, camera, pt.PTParams(max_depth=2), 64, 64, spp=8, seed=1)
    img = np.asarray(accum.resolve(film))
    assert np.isfinite(img).all()
    mean = img.mean()
    assert 0.05 < mean < 3.0
    # ceiling light visible: brightest few pixels should be >= emitter-ish
    assert img.max() > 5.0
    # left side of image (green wall at x=0 is on the RIGHT of the view
    # from -z looking at +z ... check color separation: one side redder,
    # other greener
    left = img[:, :16]
    right = img[:, -16:]
    red_bias_left = left[..., 0].mean() - left[..., 1].mean()
    red_bias_right = right[..., 0].mean() - right[..., 1].mean()
    assert red_bias_left != red_bias_right
    # determinism
    film2, _ = renderer.render_frame(
        scene, camera, pt.PTParams(max_depth=2), 64, 64, spp=8, seed=1)
    np.testing.assert_array_equal(np.asarray(film.rgb_sum),
                                  np.asarray(film2.rgb_sum))


def test_compacted_driver_matches_scan():
    """trace_compacted (host-driven per-bounce dispatch with live-ray
    compaction, VERDICT r4 next #1) is BIT-identical to the lax.scan
    trace(): compaction only ever drops dead lanes, whose L is already
    final, and per-lane math is order-independent.  Also checks the
    per-bounce stats stream (live counts must be non-increasing and the
    RR cliff at rr_depth must show)."""
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer

    scene = builtin_scenes.cornell_box().commit(force_bvh=True)
    cam = builtin_scenes.cornell_camera(32, 32)
    params = pt.PTParams(max_depth=8)
    film1, st1 = renderer.render_frame(scene, cam, params, 32, 32, spp=4,
                                       seed=3, compaction='off')
    stats = []
    film2, st2 = renderer.render_frame(scene, cam, params, 32, 32, spp=4,
                                       seed=3, compaction='auto',
                                       bounce_stats=stats)
    assert np.array_equal(np.asarray(film1.rgb_sum),
                          np.asarray(film2.rgb_sum))
    assert st1.num_rays == st2.num_rays
    lives = [s['live'] for s in stats]
    widths = [s['width'] for s in stats]
    assert lives == sorted(lives, reverse=True)
    assert widths == sorted(widths, reverse=True)
    assert all(w >= l for w, l in zip(widths[1:], lives[:-1])), \
        "a bounce ran narrower than its live count (lossy!)"
    # Russian roulette from rr_depth=5 must collapse the live set
    assert lives[-1] < lives[0] // 4


def test_compacted_driver_precomputed_sampler():
    """The precomputed-sampler tables ride the compacted state (per-ray
    set/sidx picks are gathered with the wavefront)."""
    import numpy as np
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer

    scene = builtin_scenes.cornell_box().commit(force_bvh=True)
    cam = builtin_scenes.cornell_camera(24, 24)
    params = pt.PTParams(max_depth=6)
    f1, _ = renderer.render_frame(scene, cam, params, 24, 24, spp=4,
                                  seed=5, sampler='precomputed',
                                  compaction='off')
    f2, _ = renderer.render_frame(scene, cam, params, 24, 24, spp=4,
                                  seed=5, sampler='precomputed',
                                  compaction='auto')
    assert np.array_equal(np.asarray(f1.rgb_sum), np.asarray(f2.rgb_sum))


def test_compaction_auto_gate():
    """'auto' compacts only past the Russian-roulette start
    (max_depth > rr_depth): shallow configs keep the scan form (no
    bounce_stats stream), 'on' forces the compacted driver, and both
    agree bit-exactly with 'off'."""
    import numpy as np
    import pytest
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer

    scene = builtin_scenes.cornell_box().commit(force_bvh=True)
    cam = builtin_scenes.cornell_camera(16, 16)
    params = pt.PTParams(max_depth=4)          # <= rr_depth (5)
    stats = []
    f_auto, _ = renderer.render_frame(scene, cam, params, 16, 16, spp=2,
                                      seed=7, compaction='auto',
                                      bounce_stats=stats)
    assert stats == [], "'auto' compacted a shallow (pre-RR) config"
    stats_on = []
    f_on, _ = renderer.render_frame(scene, cam, params, 16, 16, spp=2,
                                    seed=7, compaction='on',
                                    bounce_stats=stats_on)
    assert stats_on, "'on' did not force the compacted driver"
    np.testing.assert_array_equal(np.asarray(f_auto.rgb_sum),
                                  np.asarray(f_on.rgb_sum))
    with pytest.raises(ValueError):
        renderer.render_frame(scene, cam, params, 16, 16, spp=1,
                              seed=7, compaction='yes')


def test_pass_budget_watchdog_math():
    """Every public binning mode gets a watchdog-safe, BLOCK-aligned
    per-pass ray budget (VERDICT r4 next #3: ray_binning='none' used to
    inherit the sorted budget and crash the TPU worker)."""
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu.renderer import _pass_budget

    scene = builtin_scenes.cornell_box().commit(force_bvh=True)
    budgets = {}
    for binning in ('morton', 'grid', 'treelet', 'dense', 'none'):
        for depth in (1, 4, 10):
            for n_px in (1, 8):
                b, cap = _pass_budget(
                    scene, pt.PTParams(max_depth=depth,
                                       ray_binning=binning), n_px)
                assert b % (1024 * n_px) == 0, (binning, depth, n_px)
                assert cap == 1
                budgets[(binning, depth, n_px)] = b
    # unsorted packets traverse ~4-8x slower: the budget must shrink
    assert budgets[('none', 4, 1)] <= budgets[('morton', 4, 1)] // 4
    assert budgets[('none', 10, 1)] <= budgets[('morton', 10, 1)]
    # compacted driver (one bounce per dispatch): the whole-scan depth
    # divisor no longer applies — budget is the single-bounce bound,
    # still BLOCK-aligned, still 1/8-derated for unsorted packets
    for binning in ('morton', 'none'):
        for depth in (6, 10):
            b, cap = _pass_budget(
                scene, pt.PTParams(max_depth=depth, ray_binning=binning),
                1, compacted=True)
            assert cap == 1 and b % 1024 == 0
            budgets[('compact', binning, depth)] = b
    assert budgets[('compact', 'morton', 10)] == 1 << 22
    assert budgets[('compact', 'none', 10)] \
        <= budgets[('compact', 'morton', 10)] // 4
    # a production 1536^2 face (2.36M px) must fit one compacted chunk
    assert budgets[('compact', 'morton', 10)] >= 1536 * 1536
    # dense (no-BVH) path budget is memory-bound AND pair-count-bound:
    # rays x tris per pass stays under 2^32 no matter the scene size
    # (benchmark.py dense mode on a 238k-tri scene queued 2.3e10-pair
    # passes and crashed the worker, r5)
    small = builtin_scenes.cornell_box().commit(force_bvh=False)
    b, cap = _pass_budget(small, pt.PTParams(), 1)
    assert cap is None and b > 0
    import types
    for tris in (4992, 86528, 238208, 3800000):
        fake = types.SimpleNamespace(bvh=None, num_triangles=tris)
        b, cap = _pass_budget(fake, pt.PTParams(), 1)
        assert cap is None
        # pair bound (watchdog) AND packet-BLOCK alignment (a
        # non-multiple pass falls back to the ~100x XLA gather path)
        assert b * tris <= (1 << 32) or b == 1024, (tris, b)
        assert b % 1024 == 0, (tris, b)


def test_compact_widths_math():
    """Bucket widths: descending, BLOCK-aligned (so _use_packet keeps
    the Pallas kernels engaged at every width), include the full width,
    and every bucket >= its divisor share of r."""
    from yulio_raytracer_tpu.integrator.pathtracer import compact_widths

    r = 1 << 21
    ws = compact_widths(r, divisors=(1, 4, 16), align=1024)
    assert ws == sorted(ws, reverse=True)
    assert ws[0] == r
    assert all(w % 1024 == 0 for w in ws)
    assert set(ws) == {r, r // 4, r // 16}
    # tiny widths clamp to the alignment floor
    assert compact_widths(2048, divisors=(1, 16), align=1024) == \
        [2048, 1024]


def test_prewarm_gating_small_wavefronts():
    """_prewarm_shrunk_widths must be a no-op for small wavefronts
    (tests/tiny renders must not spawn compile threads) and must not
    touch the scene before the gate."""
    import jax.numpy as jnp
    from yulio_raytracer_tpu.integrator import pathtracer as pt

    n_keys = len(pt._PREWARM_KEYS)
    state = {'org': jnp.zeros((1024, 3))}
    # scene=None would raise on any attribute access past the gate
    pt._prewarm_shrunk_widths(None, pt.PTParams(), state,
                              [1024], jnp.uint32(0), None, None)
    assert len(pt._PREWARM_KEYS) == n_keys
    # no shrunk widths -> no-op even for big wavefronts
    state = {'org': jnp.zeros((1 << 19, 3))}
    pt._prewarm_shrunk_widths(None, pt.PTParams(), state,
                              [1 << 19], jnp.uint32(0), None, None)
    assert len(pt._PREWARM_KEYS) == n_keys
