"""Pallas packet-traversal kernel (interpret mode on the CPU mesh;
compiled-mode parity is exercised on real TPU by the verify drives)."""
import numpy as np
import jax.numpy as jnp

from yulio_raytracer_tpu.geometry import mesh, bvh, primitives
from yulio_raytracer_tpu.ops import intersect, pallas_traverse as ppt


def _build(meshes, leaf_size=8):
    packed = mesh.pack_meshes(meshes, pad_multiple=64)
    tree = bvh.build(packed.v0, packed.e1, packed.e2, packed.valid,
                     leaf_size=leaf_size)
    host = {k: getattr(packed, k) for k in (
        'v0', 'e1', 'e2', 'ng', 'vn', 'uv', 'mat_id', 'light_id', 'cull',
        'illum_mask', 'shadow_mask', 'valid')}
    host = bvh.permute_geom(host, tree.order)
    woop = mesh.woop_matrices(host['v0'], host['e1'], host['e2'],
                              host['valid'])
    nodes = jnp.asarray(ppt.pack_nodes(tree))
    tris = jnp.asarray(ppt.pack_tris(woop, host))
    geom = {k: jnp.asarray(v) for k, v in host.items()}
    return nodes, tris, geom, tree


def test_packet_matches_brute():
    nodes, tris, geom, _ = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5]),
        primitives.single_triangle([2, 0, 0], [3, 0, 0], [2, 1, 0],
                                   cull=mesh.CULL_BACK),
    ])
    rs = np.random.RandomState(0)
    R = ppt.BLOCK * 2
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), jnp.inf)
    hit = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                               interpret=True)
    ref = intersect.intersect_brute(geom, org, d, tn, tf, block=64)
    t1 = np.asarray(hit.t)
    t0 = np.asarray(ref.t)
    assert (np.isfinite(t1) == np.isfinite(t0)).all()
    both = np.isfinite(t1)
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)
    assert (np.asarray(hit.tri)[both] == np.asarray(ref.tri)[both]).mean() \
        > 0.999
    # occlusion variant
    occ = ppt.occluded_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.isfinite(t0))


def test_packet_sorted_matches_unsorted():
    """Ray binning (octant/Morton sort + unsort) must be transparent."""
    nodes, tris, geom, _ = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5])])
    rs = np.random.RandomState(11)
    R = ppt.BLOCK * 2
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    # mark a quarter of the rays dead (tfar < tnear) like the integrator
    tf = jnp.where(jnp.arange(R) % 4 == 0, -1.0, jnp.inf)
    bb_lo, bb_hi = (-5.0, -1.2, -5.0), (5.0, 1.0, 5.0)
    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                               interpret=True)
    hit = ppt.intersect_packet_sorted(nodes, tris, org, d, tn, tf,
                                      bb_lo, bb_hi, max_leaf=8,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(ref.tri))
    occ_ref = ppt.occluded_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                                  interpret=True)
    occ = ppt.occluded_packet_sorted(nodes, tris, org, d, tn, tf,
                                     bb_lo, bb_hi, max_leaf=8,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_packet_finite_tfar():
    nodes, tris, geom, _ = _build([
        primitives.quad([-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5])])
    R = ppt.BLOCK
    org = jnp.tile(jnp.asarray([[0.0, 3.0, 0.0]]), (R, 1))
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (R, 1))
    tn = jnp.zeros((R,))
    # tfar closer than the plane: no hits
    hit = ppt.intersect_packet(nodes, tris, org, d, tn,
                               jnp.full((R,), 2.0), max_leaf=8,
                               interpret=True)
    assert not bool(hit.valid.any())
    hit2 = ppt.intersect_packet(nodes, tris, org, d, tn,
                                jnp.full((R,), 4.0), max_leaf=8,
                                interpret=True)
    assert bool(hit2.valid.all())
    np.testing.assert_allclose(np.asarray(hit2.t), 3.0, atol=1e-5)


def test_dense_kernel_matches_brute():
    from yulio_raytracer_tpu.ops import pallas_dense as ppd
    packed = mesh.pack_meshes([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 10, 12),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5]),
        primitives.single_triangle([2, 0, 0], [3, 0, 0], [2, 1, 0],
                                   cull=mesh.CULL_BACK)], pad_multiple=64)
    host = {k: getattr(packed, k) for k in (
        'v0', 'e1', 'e2', 'ng', 'vn', 'uv', 'mat_id', 'light_id', 'cull',
        'illum_mask', 'shadow_mask', 'valid')}
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
    hit = ppd.intersect_dense(tris, org, d, tn, tf, interpret=True)
    ref = intersect.intersect_brute(geom, org, d, tn, tf, block=64)
    t1 = np.asarray(hit.t)
    t0 = np.asarray(ref.t)
    assert (np.isfinite(t1) == np.isfinite(t0)).all()
    both = np.isfinite(t1)
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)
    assert (np.asarray(hit.tri)[both] == np.asarray(ref.tri)[both]).all()


def test_dense_occluded_any_hit():
    from yulio_raytracer_tpu.ops import pallas_dense as ppd
    packed = mesh.pack_meshes([
        primitives.quad([-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5]),
        primitives.tessellate_sphere([0, 2, 0], 0.5, 8, 10)],
        pad_multiple=64)
    host = {k: getattr(packed, k) for k in (
        'v0', 'e1', 'e2', 'ng', 'vn', 'uv', 'mat_id', 'light_id', 'cull',
        'illum_mask', 'shadow_mask', 'valid')}
    woop = mesh.woop_matrices(packed.v0, packed.e1, packed.e2, packed.valid)
    tris = jnp.asarray(ppt.pack_tris(woop, host))
    geom = {k: jnp.asarray(v) for k, v in host.items()}
    rs = np.random.RandomState(5)
    R = ppd.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3 +
                      np.asarray([0, 3, 0], np.float32))
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), 8.0)
    occ = ppd.occluded_dense(tris, org, d, tn, tf, interpret=True)
    ref = intersect.occluded_brute(geom, org, d, tn, tf, block=64)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_packet_hbm_matches_vmem():
    """HBM-streaming leaf windows (DMA per leaf visit) must be
    result-identical to the VMEM-resident path — the >VMEM scene regime
    (Embree's DRAM-resident BVHs, api/scene_flat.h)."""
    nodes, tris, geom, _ = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5])])
    rs = np.random.RandomState(7)
    R = ppt.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), jnp.inf)
    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                               interpret=True)
    hit = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                               interpret=True, hbm=True)
    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(ref.tri))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-6)
    occ_ref = ppt.occluded_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                                  interpret=True)
    occ = ppt.occluded_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                              interpret=True, hbm=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_binned_matches_plain():
    """Treelet-binned wavefront traversal (intersect/occluded_packet_binned)
    is exact: identical to the plain packet kernel at every round count,
    including dead lanes and the round-0 (fallback-only) edge."""
    nodes, tris, geom, tree = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.tessellate_sphere([3, 0, 0], 0.7, 10, 12),
        primitives.quad([-6, -1.2, -6], [6, -1.2, -6], [6, -1.2, 6],
                        [-6, -1.2, 6]),
    ])
    troots, tboxes = ppt.treelet_cut(np.asarray(nodes), max_treelets=6)
    assert len(troots) > 1
    rs = np.random.RandomState(5)
    R = ppt.BLOCK * 2
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 2)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), np.inf).at[::5].set(-1.0)   # some dead lanes
    bb_lo = tuple(np.asarray(jnp.min(geom['v0'], axis=0)).tolist())
    bb_hi = tuple(np.asarray(jnp.max(geom['v0'], axis=0)).tolist())

    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf,
                               max_leaf=tree_leaf(tree), interpret=True)
    for rounds in (0, 2):
        got = ppt.intersect_packet_binned(
            nodes, tris, jnp.asarray(troots), jnp.asarray(tboxes),
            org, d, tn, tf, bb_lo, bb_hi, max_leaf=tree_leaf(tree),
            interpret=True, rounds=rounds)
        np.testing.assert_array_equal(np.asarray(ref.tri),
                                      np.asarray(got.tri))
        np.testing.assert_allclose(
            np.where(np.isfinite(ref.t), ref.t, 0.0),
            np.where(np.isfinite(got.t), got.t, 0.0), atol=1e-5)

    tfo = jnp.full((R,), 3.0).at[::5].set(-1.0)
    refo = ppt.occluded_packet(nodes, tris, org, d, tn, tfo,
                               max_leaf=tree_leaf(tree), interpret=True)
    goto = ppt.occluded_packet_binned(
        nodes, tris, jnp.asarray(troots), jnp.asarray(tboxes),
        org, d, tn, tfo, bb_lo, bb_hi, max_leaf=tree_leaf(tree),
        interpret=True, rounds=2)
    np.testing.assert_array_equal(np.asarray(refo), np.asarray(goto))


def tree_leaf(tree):
    return 8


def _planes(geom):
    from yulio_raytracer_tpu.ops import pallas_pairs as ppp
    host = {k: np.asarray(v) for k, v in geom.items()}
    woop = mesh.woop_matrices(host['v0'], host['e1'], host['e2'],
                              host['valid'])
    planes, rows = ppp.pack_planes(np.asarray(woop), host)
    return jnp.asarray(planes), jnp.asarray(rows)


def test_fat_leaf_packet_matches_brute():
    """max_leaf=256 (the multi-million-triangle growth path — node table
    must fit SMEM, so commit grows leaves past 128): the packet kernels'
    leaf machinery stays exact at fat leaf sizes."""
    nodes, tris, geom, _ = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 16, 24),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5]),
    ], leaf_size=256)
    rs = np.random.RandomState(1)
    R = ppt.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), jnp.inf)
    hit = ppt.intersect_packet(nodes, tris, org, d, tn, tf,
                               max_leaf=256, interpret=True)
    ref = intersect.intersect_brute(geom, org, d, tn, tf, block=64)
    both = np.isfinite(np.asarray(ref.t))
    assert (np.isfinite(np.asarray(hit.t)) == both).all()
    assert (np.asarray(hit.tri)[both] == np.asarray(ref.tri)[both]).all()
    occ = ppt.occluded_packet(nodes, tris, org, d, tn,
                              jnp.full((R,), 3.0), max_leaf=256,
                              interpret=True)
    refo = intersect.intersect_brute(geom, org, d, tn,
                                     jnp.full((R,), 3.0), block=64)
    np.testing.assert_array_equal(np.asarray(occ),
                                  np.isfinite(np.asarray(refo.t)))


def test_precomputed_perm_matches_sorted():
    """occluded_packet_sorted(perm=...) — the integrator's shared
    hit-point sort for NEE shadow batches — must agree with the
    key-sorted call and the unsorted kernel."""
    nodes, tris, geom, _ = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5]),
    ])
    rs = np.random.RandomState(9)
    R = ppt.BLOCK
    r0 = R // 2                   # r0 hit points, 2 "lights"
    p = jnp.asarray(rs.randn(r0, 3).astype(np.float32) * 2)
    org = jnp.tile(p, (2, 1))
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), 3.0).at[::7].set(-1.0)
    bb_lo = tuple(np.asarray(jnp.min(geom['v0'], axis=0)).tolist())
    bb_hi = tuple(np.asarray(jnp.max(geom['v0'], axis=0)).tolist())
    live = jnp.ones((r0,), bool).at[::5].set(False)
    perm = ppt.tile_perm(
        ppt.hitpoint_sort_perm(p, bb_lo, bb_hi, live=live), 2, r0)
    # perm must be a valid permutation of the concatenated batch
    assert (np.sort(np.asarray(perm)) == np.arange(R)).all()
    base = ppt.occluded_packet(nodes, tris, org, d, tn, tf,
                               max_leaf=8, interpret=True)
    got = ppt.occluded_packet_sorted(nodes, tris, org, d, tn, tf,
                                     bb_lo, bb_hi, max_leaf=8,
                                     interpret=True, perm=perm)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_pairs_matches_brute():
    """Outer-product dense kernel (rays-in-sublanes) is exact vs brute
    force: closest hit incl. recomputed u/v, any-hit incl. dead lanes,
    and the ranged (treelet-sweep) form."""
    from yulio_raytracer_tpu.ops import pallas_pairs as ppp
    nodes, tris, geom, _ = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5]),
        primitives.single_triangle([2, 0, 0], [3, 0, 0], [2, 1, 0],
                                   cull=mesh.CULL_BACK),
    ])
    planes, rows = _planes(geom)
    rs = np.random.RandomState(3)
    R = 128
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), jnp.inf).at[::5].set(-1.0)
    hit = ppp.intersect_pairs(planes, rows, org, d, tn, tf,
                              rt=2, kb=2, interpret=True)
    ref = intersect.intersect_brute(geom, org, d, tn, tf, block=64)
    both = np.isfinite(np.asarray(ref.t))
    assert (np.isfinite(np.asarray(hit.t)) == both).all()
    np.testing.assert_allclose(np.asarray(hit.t)[both],
                               np.asarray(ref.t)[both],
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(hit.tri)[both] == np.asarray(ref.tri)[both]).all()
    np.testing.assert_allclose(np.asarray(hit.u)[both],
                               np.asarray(ref.u)[both], atol=1e-4)
    np.testing.assert_allclose(np.asarray(hit.v)[both],
                               np.asarray(ref.v)[both], atol=1e-4)
    # any-hit (dead lanes report False, the occluded_packet contract)
    tfo = jnp.full((R,), 3.0).at[::5].set(-1.0)
    occ = ppp.occluded_pairs(planes, org, d, tn, tfo, rt=2, kb=2,
                             interpret=True)
    refo = intersect.intersect_brute(geom, org, d, tn, tfo, block=64)
    expect = np.isfinite(np.asarray(refo.t))
    np.testing.assert_array_equal(np.asarray(occ), expect)
    # explicit full-range ranged call == plain call
    gs = jnp.zeros((R // 16,), jnp.int32)
    ge = jnp.full((R // 16,), planes.shape[0], jnp.int32)
    hit2 = ppp.intersect_pairs(planes, rows, org, d, tn, tf,
                               gs=gs, ge=ge, rt=2, kb=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(hit2.tri),
                                  np.asarray(hit.tri))


def test_grid_matches_plain():
    """Uniform-grid DDA + cell-binned dense sweeps (ops/grid.py) are
    exact vs the packet kernel: closest (incl. u/v and original-triangle
    id mapping through the duplicated planes) and any-hit (incl. the
    dead-lane False contract), at rounds=0 (pure fallback) and beyond."""
    from yulio_raytracer_tpu.ops import grid as gridm
    nodes, tris, geom, tree = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.tessellate_sphere([3, 0, 0], 0.7, 10, 12),
        primitives.quad([-6, -1.2, -6], [6, -1.2, -6], [6, -1.2, 6],
                        [-6, -1.2, 6]),
    ])
    host = {k: np.asarray(v) for k, v in geom.items()}
    host['woop'] = np.asarray(mesh.woop_matrices(
        host['v0'], host['e1'], host['e2'], host['valid']))
    grid = gridm.build_grid(host, res=4)
    rs = np.random.RandomState(5)
    R = ppt.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 2)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), np.inf).at[::5].set(-1.0)
    bb_lo = tuple(np.asarray(jnp.min(geom['v0'], axis=0)).tolist())
    bb_hi = tuple(np.asarray(jnp.max(geom['v0'], axis=0)).tolist())

    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf,
                               max_leaf=8, interpret=True)
    for rounds in (0, 3):
        got = gridm.intersect_grid(grid, nodes, tris, org, d, tn, tf,
                                   bb_lo, bb_hi, res=4, rounds=rounds,
                                   rt=2, max_leaf=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.tri),
                                      np.asarray(got.tri))
        np.testing.assert_allclose(
            np.where(np.isfinite(ref.t), ref.t, 0.0),
            np.where(np.isfinite(got.t), got.t, 0.0), atol=1e-5)
        hits = np.asarray(ref.tri) >= 0
        np.testing.assert_allclose(np.asarray(ref.u)[hits],
                                   np.asarray(got.u)[hits], atol=1e-4)

    tfo = jnp.full((R,), 3.0).at[::5].set(-1.0)
    refo = ppt.occluded_packet(nodes, tris, org, d, tn, tfo,
                               max_leaf=8, interpret=True)
    for rounds in (0, 3):
        goto = gridm.occluded_grid(grid, nodes, tris, org, d, tn, tfo,
                                   bb_lo, bb_hi, res=4, rounds=rounds,
                                   rt=2, max_leaf=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(refo), np.asarray(goto))


def test_grid_march_matches_plain():
    """Fully in-kernel grid march (ops/grid.py intersect_march): the
    shared-wavefront DDA with a visited-cell mask is exact vs the packet
    kernel (no fallback pass exists to paper over misses)."""
    from yulio_raytracer_tpu.ops import grid as gridm
    nodes, tris, geom, tree = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.tessellate_sphere([3, 0, 0], 0.7, 10, 12),
        primitives.quad([-6, -1.2, -6], [6, -1.2, -6], [6, -1.2, 6],
                        [-6, -1.2, 6]),
    ])
    host = {k: np.asarray(v) for k, v in geom.items()}
    host['woop'] = np.asarray(mesh.woop_matrices(
        host['v0'], host['e1'], host['e2'], host['valid']))
    grid = gridm.build_grid(host, res=4)
    rs = np.random.RandomState(5)
    R = ppt.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 2)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), np.inf).at[::5].set(-1.0)
    bb_lo = tuple(np.asarray(jnp.min(geom['v0'], axis=0)).tolist())
    bb_hi = tuple(np.asarray(jnp.max(geom['v0'], axis=0)).tolist())
    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf,
                               max_leaf=8, interpret=True)
    got = gridm.intersect_march(grid, org, d, tn, tf, bb_lo, bb_hi,
                                res=4, kb=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.tri),
                                  np.asarray(got.tri))
    np.testing.assert_allclose(
        np.where(np.isfinite(ref.t), ref.t, 0.0),
        np.where(np.isfinite(got.t), got.t, 0.0), atol=1e-5)
    hits = np.asarray(ref.tri) >= 0
    np.testing.assert_allclose(np.asarray(ref.u)[hits],
                               np.asarray(got.u)[hits], atol=1e-4)


def test_dense_binned_matches_plain():
    """Treelet-binned dense sweeps (intersect/occluded_dense_binned) are
    exact: identical to the packet kernel at every round count."""
    nodes, tris, geom, tree = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.tessellate_sphere([3, 0, 0], 0.7, 10, 12),
        primitives.quad([-6, -1.2, -6], [6, -1.2, -6], [6, -1.2, 6],
                        [-6, -1.2, 6]),
    ])
    nodes_np = np.asarray(nodes)
    troots, tboxes = ppt.treelet_cut(nodes_np, max_treelets=6)
    tgs, tge = ppt.treelet_tri_tiles(nodes_np, troots)
    planes, rows = _planes(geom)
    rs = np.random.RandomState(5)
    R = ppt.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 2)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), np.inf).at[::5].set(-1.0)
    bb_lo = tuple(np.asarray(jnp.min(geom['v0'], axis=0)).tolist())
    bb_hi = tuple(np.asarray(jnp.max(geom['v0'], axis=0)).tolist())

    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf,
                               max_leaf=8, interpret=True)
    for rounds in (0, 2):
        got = ppt.intersect_dense_binned(
            nodes, tris, planes, rows, jnp.asarray(tboxes),
            jnp.asarray(tgs), jnp.asarray(tge), org, d, tn, tf,
            bb_lo, bb_hi, max_leaf=8, interpret=True, rounds=rounds,
            rt=2)
        np.testing.assert_array_equal(np.asarray(ref.tri),
                                      np.asarray(got.tri))
        np.testing.assert_allclose(
            np.where(np.isfinite(ref.t), ref.t, 0.0),
            np.where(np.isfinite(got.t), got.t, 0.0), atol=1e-5)
        hits = np.asarray(ref.tri) >= 0
        np.testing.assert_allclose(np.asarray(ref.u)[hits],
                                   np.asarray(got.u)[hits], atol=1e-4)

    tfo = jnp.full((R,), 3.0).at[::5].set(-1.0)
    refo = ppt.occluded_packet(nodes, tris, org, d, tn, tfo,
                               max_leaf=8, interpret=True)
    goto = ppt.occluded_dense_binned(
        nodes, tris, planes, jnp.asarray(tboxes), jnp.asarray(tgs),
        jnp.asarray(tge), org, d, tn, tfo, bb_lo, bb_hi, max_leaf=8,
        interpret=True, rounds=2, rt=2)
    np.testing.assert_array_equal(np.asarray(refo), np.asarray(goto))


def test_splitleaf_matches_packet():
    """Split-leaf deferred-sweep kernel is exact vs the in-line packet
    kernel (closest hit incl. culling, dead rays, finite tfar)."""
    from yulio_raytracer_tpu.ops import pallas_splitleaf as psl
    nodes, tris, geom, _ = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.tessellate_sphere([2.5, 0.5, -1], 0.8, 10, 12),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5]),
        primitives.single_triangle([2, 0, 0], [3, 0, 0], [2, 1, 0],
                                   cull=mesh.CULL_BACK),
    ], leaf_size=8)
    rs = np.random.RandomState(3)
    R = psl.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), np.inf).at[::7].set(-1.0)   # dead rays
    ref = ppt.intersect_packet(nodes, tris, org, d, tn, tf,
                               max_leaf=8, interpret=True)
    got = psl.intersect_packet_split(nodes, tris, org, d, tn, tf,
                                     max_leaf=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    np.testing.assert_allclose(
        np.where(np.isfinite(ref.t), ref.t, 0.0),
        np.where(np.isfinite(got.t), got.t, 0.0), atol=1e-5)
    bb_lo = tuple(np.asarray(jnp.min(geom['v0'], axis=0)).tolist())
    bb_hi = tuple(np.asarray(jnp.max(geom['v0'], axis=0)).tolist())
    gots = psl.intersect_packet_split_sorted(nodes, tris, org, d, tn, tf,
                                             bbox_lo=bb_lo, bbox_hi=bb_hi,
                                             max_leaf=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.tri),
                                  np.asarray(gots.tri))


def test_wide_bvh4_matches_binary():
    """The BVH4 kernel (ops/pallas_wide.py) is an encoding change of the
    same tree: hits must match the binary packet kernel exactly."""
    from yulio_raytracer_tpu.ops import pallas_wide as pw
    nodes, tris, geom, tree = _build([
        primitives.tessellate_sphere([0, 0, 0], 1.0, 12, 16),
        primitives.quad([-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                        [-5, -1.2, 5]),
        primitives.single_triangle([2, 0, 0], [3, 0, 0], [2, 1, 0],
                                   cull=mesh.CULL_BACK),
    ])
    nodes4 = jnp.asarray(pw.pack_nodes4(tree))
    rs = np.random.RandomState(5)
    R = ppt.BLOCK
    org = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 3)
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tn = jnp.full((R,), 1e-4)
    tf = jnp.full((R,), jnp.inf)
    h2 = ppt.intersect_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                              interpret=True)
    h4 = pw.intersect_packet4(nodes4, tris, org, d, tn, tf, max_leaf=8,
                              interpret=True)
    t2, t4 = np.asarray(h2.t), np.asarray(h4.t)
    assert (np.isfinite(t2) == np.isfinite(t4)).all()
    both = np.isfinite(t2)
    np.testing.assert_allclose(t4[both], t2[both], rtol=1e-6, atol=1e-7)
    assert (np.asarray(h2.tri) == np.asarray(h4.tri)).all()
    # any-hit variant agrees with the binary any-hit kernel
    o2 = ppt.occluded_packet(nodes, tris, org, d, tn, tf, max_leaf=8,
                             interpret=True)
    o4 = pw.occluded_packet4(nodes4, tris, org, d, tn, tf, max_leaf=8,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o4))
    # 8-wide encoding of the same tree matches too (closest + any-hit)
    nodes8 = jnp.asarray(pw.pack_nodes8(tree))
    h8 = pw.intersect_packet4(nodes8, tris, org, d, tn, tf, max_leaf=8,
                              interpret=True, width=8)
    t8 = np.asarray(h8.t)
    assert (np.isfinite(t2) == np.isfinite(t8)).all()
    np.testing.assert_allclose(t8[both], t2[both], rtol=1e-6, atol=1e-7)
    assert (np.asarray(h2.tri) == np.asarray(h8.tri)).all()
    o8 = pw.occluded_packet4(nodes8, tris, org, d, tn, tf, max_leaf=8,
                             interpret=True, width=8)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o8))
