"""On-TPU kernel tier: runs the COMPILED Pallas kernels on the real chip.

The default suite forces CPU and exercises every kernel in interpret
mode (tests/test_pallas.py); before this tier, the only on-chip checks
were bench.py's PSNR gates, so a Mosaic lowering regression surfaced as
an unexplained benchmark dip instead of a failing named test (reference
analog: the regression fuzzer's crash-shaking role, regression.cpp, but
assertion-grade).

Run with:  YRT_TPU_TESTS=1 python -m pytest -m tpu tests/ -q
Never run concurrently with another TPU process — the axon device
grant is exclusive per process.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yulio_raytracer_tpu.geometry import mesh, bvh, primitives
from yulio_raytracer_tpu.ops import intersect, pallas_traverse as ppt

pytestmark = pytest.mark.tpu

if not os.environ.get("YRT_TPU_TESTS"):
    pytest.skip("on-TPU tier (set YRT_TPU_TESTS=1 and pass -m tpu)",
                allow_module_level=True)


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")


def _psnr(a, b):
    mse = ((a - b) ** 2).mean()
    return 10 * np.log10(max(a.max(), 1e-9) ** 2 / max(mse, 1e-20))


def _host_keys(packed):
    return {k: getattr(packed, k) for k in (
        'v0', 'e1', 'e2', 'ng', 'vn', 'uv', 'mat_id', 'light_id', 'cull',
        'illum_mask', 'shadow_mask', 'valid')}


@pytest.fixture(scope="module")
def built():
    """Small mixed scene packed both for the packet kernel and brute."""
    packed = mesh.pack_meshes([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5]),
        primitives.single_triangle([2, 0, 0], [3, 0, 0], [2, 1, 0],
                                   cull=mesh.CULL_BACK)], pad_multiple=64)
    tree = bvh.build(packed.v0, packed.e1, packed.e2, packed.valid,
                     leaf_size=8)
    host = bvh.permute_geom(_host_keys(packed), tree.order)
    woop = mesh.woop_matrices(host['v0'], host['e1'], host['e2'],
                              host['valid'])
    nodes = jnp.asarray(ppt.pack_nodes(tree))
    tris = jnp.asarray(ppt.pack_tris(woop, host))
    geom = {k: jnp.asarray(v) for k, v in host.items()}
    return nodes, tris, geom


@pytest.fixture(scope="module")
def rays():
    rs = np.random.RandomState(0)
    R = ppt.BLOCK * 2
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return org, jnp.asarray(d), jnp.full((R,), 1e-4), jnp.full((R,), jnp.inf)


def test_packet_matches_brute_compiled(built, rays):
    """Closest-hit + any-hit packet kernels, compiled, vs XLA brute."""
    nodes, tris, geom = built
    org, d, tn, tf = rays
    hit = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8)
    ref = intersect.intersect_brute(geom, org, d, tn, tf, block=64)
    t1, t0 = np.asarray(hit.t), np.asarray(ref.t)
    assert (np.isfinite(t1) == np.isfinite(t0)).all()
    both = np.isfinite(t1)
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)
    assert (np.asarray(hit.tri)[both] == np.asarray(ref.tri)[both]).mean() \
        > 0.999
    occ = ppt.occluded_packet(nodes, tris, org, d, tn, tf, max_leaf=8)
    np.testing.assert_array_equal(np.asarray(occ), np.isfinite(t0))


def test_packet_hbm_matches_vmem_compiled(built, rays):
    """HBM leaf-window DMA streaming must be result-identical on chip."""
    nodes, tris, geom = built
    org, d, tn, tf = rays
    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8)
    hit = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                               hbm=True)
    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(ref.tri))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-6)
    occ_ref = ppt.occluded_packet(nodes, tris, org, d, tn, tf, max_leaf=8)
    occ = ppt.occluded_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                              hbm=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_packet_sorted_matches_unsorted_compiled(built, rays):
    """Ray binning (sort + unsort) transparent on chip, incl. dead lanes."""
    nodes, tris, geom = built
    org, d, tn, _ = rays
    R = org.shape[0]
    tf = jnp.where(jnp.arange(R) % 4 == 0, -1.0, jnp.inf)
    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8)
    hit = ppt.intersect_packet_sorted(nodes, tris, org, d, tn, tf,
                                      (-5.0, -1.2, -5.0), (5.0, 1.0, 5.0),
                                      max_leaf=8)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-6)


def test_dense_matches_brute_compiled():
    """The small-scene dense kernel (no BVH), compiled."""
    from yulio_raytracer_tpu.ops import pallas_dense as ppd
    packed = mesh.pack_meshes([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 10, 12),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5])], pad_multiple=64)
    host = _host_keys(packed)
    woop = mesh.woop_matrices(packed.v0, packed.e1, packed.e2, packed.valid)
    tris = jnp.asarray(ppt.pack_tris(woop, host))
    geom = {k: jnp.asarray(v) for k, v in host.items()}
    rs = np.random.RandomState(3)
    R = ppd.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), jnp.inf)
    hit = ppd.intersect_dense(tris, org, d, tn, tf)
    ref = intersect.intersect_brute(geom, org, d, tn, tf, block=64)
    t1, t0 = np.asarray(hit.t), np.asarray(ref.t)
    assert (np.isfinite(t1) == np.isfinite(t0)).all()
    both = np.isfinite(t1)
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)
    occ = ppd.occluded_dense(tris, org, d, tn, jnp.full((R,), 8.0))
    occ_ref = intersect.occluded_brute(geom, org, d, tn,
                                       jnp.full((R,), 8.0))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_motion_packet_compiled():
    """Time-aware motion-blur packet kernel, compiled, vs XLA brute."""
    from yulio_raytracer_tpu.io import builtin_scenes
    scene = builtin_scenes.motion_field(n_spheres=6, tess=(8, 10)).commit(
        force_bvh=True)
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
        time, max_leaf=scene.leaf_size)
    ref = intersect.intersect_brute(scene.geom, org, d, tn, tf, block=64,
                                    time=time)
    t1, t0 = np.asarray(hit.t), np.asarray(ref.t)
    assert (np.isfinite(t1) == np.isfinite(t0)).all()
    both = np.isfinite(t1)
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)


def test_sbvh_gather_tree_compiled():
    """Spatial-split (SBVH) trees duplicate straddling triangles into
    several leaves (gather list, R >= T).  The compiled packet kernel
    over such a tree must agree with brute force over the same gathered
    geometry on hit distance (tri ids may legitimately differ between
    duplicates of one source triangle — their t ties)."""
    from yulio_raytracer_tpu.io import builtin_scenes
    sb = builtin_scenes.colonnade(cols_x=3, cols_z=2, tess=(8, 10))
    scene = sb.commit(quality='high-spatial')
    rs = np.random.RandomState(4)
    R = ppt.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 4
                      + np.asarray([0, 2, 0], np.float32))
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), jnp.inf)
    hit = ppt.intersect_packet(scene.packet['nodes'], scene.packet['tris'],
                               org, d, tn, tf, max_leaf=scene.leaf_size)
    ref = intersect.intersect_brute(scene.geom, org, d, tn, tf, block=64)
    t1, t0 = np.asarray(hit.t), np.asarray(ref.t)
    assert (np.isfinite(t1) == np.isfinite(t0)).all()
    both = np.isfinite(t1)
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)


def test_cornell_golden_on_tpu():
    """Full production render path on chip vs the pinned CPU golden —
    the assertion-grade version of bench.py's PSNR gates."""
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer
    from yulio_raytracer_tpu.film import accum
    scene = builtin_scenes.cornell_box().commit()
    cam = builtin_scenes.cornell_camera(64, 64)
    film, _ = renderer.render_frame(scene, cam, pt.PTParams(max_depth=4),
                                    64, 64, spp=32, seed=42)
    img = np.asarray(accum.resolve(film))
    golden = np.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'assets', 'golden', 'cornell_64_cpu.npz'))['img']
    assert _psnr(img, golden) > 40.0
