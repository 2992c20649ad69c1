import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yulio_raytracer_tpu.io import builtin_scenes
from yulio_raytracer_tpu.integrator import pathtracer as pt
from yulio_raytracer_tpu import renderer
from yulio_raytracer_tpu.parallel import sharding
from yulio_raytracer_tpu.film import accum


@pytest.fixture(scope='module')
def scene():
    return builtin_scenes.cornell_box(with_boxes=False).commit()


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_px_sharded_matches_single(scene):
    cam = builtin_scenes.cornell_camera(32, 32)
    params = pt.PTParams(max_depth=2)
    film_ref, _ = renderer.render_frame(scene, cam, params, 32, 32, spp=2,
                                        seed=3)
    mesh = sharding.make_mesh(8, tri_parallel=1)
    film_sh = sharding.render_frame_sharded(scene, cam, params, 32, 32,
                                            spp=2, mesh=mesh, seed=3)
    a = np.asarray(accum.resolve(film_ref))
    b = np.asarray(accum.resolve(film_sh))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_tri_sharded_matches_single(scene):
    cam = builtin_scenes.cornell_camera(32, 32)
    params = pt.PTParams(max_depth=2)
    film_ref, _ = renderer.render_frame(scene, cam, params, 32, 32, spp=2,
                                        seed=5)
    mesh = sharding.make_mesh(8, tri_parallel=4)   # 2-way px x 4-way tri
    film_sh = sharding.render_frame_sharded(scene, cam, params, 32, 32,
                                            spp=2, mesh=mesh, seed=5)
    a = np.asarray(accum.resolve(film_ref))
    b = np.asarray(accum.resolve(film_sh))
    # identical up to cross-shard closest-hit tie-breaks at triangle seams
    # (a handful of edge pixels may pick the coplanar neighbor)
    d = np.abs(a - b).max(axis=-1)
    assert (d < 1e-4).mean() > 0.995, (d > 1e-4).sum()
    assert d.mean() < 1e-3


def test_sharded_accumulation(scene):
    cam = builtin_scenes.cornell_camera(32, 32)
    params = pt.PTParams(max_depth=2)
    mesh = sharding.make_mesh(8)
    f1 = sharding.render_frame_sharded(scene, cam, params, 32, 32, spp=2,
                                       mesh=mesh, seed=3)
    f2 = sharding.render_frame_sharded(scene, cam, params, 32, 32, spp=2,
                                       mesh=mesh, seed=3, film=f1,
                                       iteration=1)
    assert float(f2.weight[0, 0]) == 4.0
    # same estimator -> means agree within Monte-Carlo noise (2 spp)
    m1 = float(jnp.mean(accum.resolve(f1)))
    m2 = float(jnp.mean(accum.resolve(f2)))
    assert abs(m1 - m2) < 0.15 * max(m1, 1e-6)


def test_sharded_render_odd_size():
    """Pixel counts that don't divide the px axis pad instead of assert
    (a 1536^2 face on a 7-healthy-device mesh must render)."""
    from yulio_raytracer_tpu.parallel import sharding
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu.film import accum
    import numpy as np

    scene = builtin_scenes.cornell_box(with_boxes=False).commit()
    params = pt.PTParams(max_depth=2)
    # 18x14 = 252 pixels, not divisible by 8 devices
    camera = builtin_scenes.cornell_camera(18, 14)
    mesh = sharding.make_mesh(8)
    film = sharding.render_frame_sharded(scene, camera, params, 18, 14,
                                         spp=1, mesh=mesh, seed=0)
    out = np.asarray(accum.resolve(film))
    assert out.shape == (14, 18, 3)
    assert np.isfinite(out).all()
