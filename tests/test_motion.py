"""Motion blur (the sphere_motion golden-scene feature)."""
import os
import numpy as np
import jax.numpy as jnp
import pytest

from yulio_raytracer_tpu.geometry.mesh import HostMesh
from yulio_raytracer_tpu.scene import SceneBuilder
from yulio_raytracer_tpu.shading import materials as gmat
from yulio_raytracer_tpu.lights import lights as gl
from yulio_raytracer_tpu.ops import intersect
from yulio_raytracer_tpu.integrator import pathtracer as pt
from yulio_raytracer_tpu.io import builtin_scenes
from yulio_raytracer_tpu import renderer
from yulio_raytracer_tpu.film import accum


def _moving_quad(material=0, speed=(2.0, 0.0, 0.0)):
    pos = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                     np.float32)
    tri = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    mot = np.tile(np.asarray(speed, np.float32), (4, 1))
    return HostMesh(pos, tri, motions=mot, material=material)


def test_intersect_with_time():
    sb = SceneBuilder()
    m = sb.add_material(gmat.make_material('matte', {}))
    sb.add_mesh(_moving_quad(m))
    scene = sb.commit()
    assert 'mv0' in scene.geom
    org = jnp.asarray([[0.0, 3.0, 0.0], [2.0, 3.0, 0.0]])
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (2, 1))
    tn = jnp.zeros((2,))
    tf = jnp.full((2,), jnp.inf)
    # t=0: quad at origin — first ray hits, second misses
    h0 = intersect.intersect_brute(scene.geom, org, d, tn, tf,
                                   time=jnp.zeros((2,)))
    assert bool(h0.valid[0]) and not bool(h0.valid[1])
    # t=1: quad moved +2 in x — reversed
    h1 = intersect.intersect_brute(scene.geom, org, d, tn, tf,
                                   time=jnp.ones((2,)))
    assert not bool(h1.valid[0]) and bool(h1.valid[1])


def test_motion_blur_render_smears():
    sb = SceneBuilder()
    # black quad against the white dome: hits ~0, misses ~1, so motion
    # blur shows as intermediate pixel values
    m = sb.add_material(gmat.make_material('matte', {'reflectance': 0.0}))
    sb.add_mesh(_moving_quad(m, speed=(3.0, 0.0, 0.0)))
    sb.add_light(gl.ambient((1.0, 1.0, 1.0)))
    scene = sb.commit()
    from yulio_raytracer_tpu.cameras import cameras as cam
    camera = cam.Pinhole(cam.look_at((1.5, 6, 0.01), (1.5, 0, 0), (0, 0, 1)),
                         angle=60.0)
    film, _ = renderer.render_frame(scene, camera, pt.PTParams(max_depth=2),
                                    32, 32, spp=16, seed=0)
    img = np.asarray(accum.resolve(film)).mean(axis=-1)
    # the quad sweeps x in [-1, 4]: center pixels are partially covered
    # over time -> intermediate brightness (blur), not binary
    mid = img[16, :]
    assert ((mid > 0.1) & (mid < 0.9)).any(), mid


def test_reference_sphere_motion_scene_loads():
    ref = "/root/reference/models/sphere_motion.xml"
    if not os.path.exists(ref):
        pytest.skip("reference models not present")
    from yulio_raytracer_tpu.io import xml_scene
    sb = SceneBuilder()
    xml_scene.load_xml(ref, sb)
    assert any(m.motions is not None for m in sb.meshes)
    sb.add_light(gl.ambient((1.0, 1.0, 1.0)))
    scene = sb.commit()
    assert 'mv0' in scene.geom


def test_motion_packet_matches_brute():
    """Motion blur under the accelerated path: union-bounds BVH + the
    time-aware MT packet kernel must match the dense time-aware
    intersector exactly (the -accel bvh4mb regime of sphere_motion.ecs)."""
    from yulio_raytracer_tpu.geometry import primitives
    from yulio_raytracer_tpu.ops import pallas_traverse as ppt
    sb = SceneBuilder()
    m = sb.add_material(gmat.make_material('matte', {}))
    sb.add_mesh(_moving_quad(m, speed=(2.0, 0.0, 0.0)))
    sph = primitives.tessellate_sphere([0, 2, 0], 0.6, 10, 12, material=m)
    sph.motions = np.tile(np.asarray([0.0, -1.5, 0.0], np.float32),
                          (len(sph.positions), 1))
    sb.add_mesh(sph)
    scene = sb.commit(force_bvh=True, leaf_size=8)
    assert scene.packet is not None and 'tris_mb' in scene.packet

    rs = np.random.RandomState(9)
    R = ppt.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 2
                      + np.asarray([0, 3, 0], np.float32))
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), jnp.inf)
    time = jnp.asarray(rs.rand(R).astype(np.float32))

    hit = ppt.intersect_packet_mb(
        scene.packet['nodes'], scene.packet['tris_mb'], org, d, tn, tf,
        time, max_leaf=scene.leaf_size, interpret=True)
    ref = intersect.intersect_brute(scene.geom, org, d, tn, tf, block=64,
                                    time=time)
    t1, t0 = np.asarray(hit.t), np.asarray(ref.t)
    assert (np.isfinite(t1) == np.isfinite(t0)).all()
    both = np.isfinite(t1)
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)
    assert (np.asarray(hit.tri)[both] == np.asarray(ref.tri)[both]).mean() \
        > 0.999
    occ = ppt.occluded_packet_mb(
        scene.packet['nodes'], scene.packet['tris_mb'], org, d, tn,
        jnp.full((R,), 4.0), time, max_leaf=scene.leaf_size,
        interpret=True)
    occ_ref = intersect.occluded_brute(scene.geom, org, d, tn,
                                       jnp.full((R,), 4.0), time=time)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))
