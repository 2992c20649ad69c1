"""Scene assembly + commit: the analog of `rtCommit(scene)`.

The reference builds a `BackendSceneFlat` at commit: extract every shape
into Embree, build the BVH, collect lights, let lights create shapes
(area lights become visible geometry) and compute the scene bsphere for the
ambient dome (`api/scene_flat.h:87-136`).  Here commit produces one
immutable pytree (`TpuScene`) holding:

* packed+BVH-permuted SoA triangle tables (device arrays),
* the flattened BVH (when the triangle count warrants it — small scenes
  intersect faster brute-force on TPU, see ops/intersect.py),
* the material lobe table + texture atlas,
* the static light list (ambient lights get the scene bsphere here).

Two-level instancing (api/scene_instancing.h + api/instance.h): NOT
implemented, by decision.  The reference itself ships it disabled — the
"twolevel" backend is commented out at singleray_device.cpp:341 and every
scene goes through BackendSceneFlat ("no support for instancing, best
render performance", scene_flat.h:25).  Loader-level instancing (the only
kind the front-ends emit) is covered: every rtTransformPrimitive /
re-instanced <ref> bakes its transform into vertices here, which is also
the TPU-optimal layout (one flat SoA table; a traversal-time transform
per instance would add per-ray matrix gathers to the hot kernel).

Measured at HBM scale (scripts/bench_instancing.py, one v5e chip,
2026-08): 16 flattened copies of the 238k-tri sponza_like interior =
3.81M tris -> 244 MB packed triangle rows + 0.7 MB nodes (HBM-streamed,
leaf 512), camera-packet traversal 4.8 Mrays/s.  Two-level instancing
would cut triangle storage 16x (to 15 MB) on a 16 GB-HBM part that is
1.5% full — no memory case until ~250M unique-instance triangles, far
past production scenes — while adding a per-ray top-level round +
instance transforms to every traversal.  Decision stands, with data.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .geometry import mesh as gmesh
from .geometry import bvh as gbvh
from .geometry import primitives
from .shading import materials as gmat
from .shading import textures as gtex
from .lights import lights as glights

# below this triangle count, brute-force beats traversal on TPU
# (retuned for the round-2 packet kernel: at 5k tris BVH already wins
# 2.4x — see BENCHMATRIX.json sphere_glass dense-vs-bvh)
BRUTE_FORCE_MAX_TRIS = 2048
# packed triangle rows beyond this stay HBM-resident and the packet
# kernels DMA leaf windows (VMEM is ~16 MB and the kernel needs room for
# ray blocks; Embree likewise keeps big BVHs DRAM-resident).  Round-4
# probe: a 15.74 MB table compiles and runs VMEM-resident (+16% on
# sponza bounce-1 closest vs HBM streaming, _vmem_probe.log), so the
# limit sits at 15.3 MB with ~0.6 MB headroom for the kernel's ray
# blocks and compiler scratch.
TRIS_VMEM_LIMIT_BYTES = int(15.3 * (1 << 20))
# uniform-grid resolution for the DDA dense-sweep path (ops/grid.py):
# coarse is right for the 128-lane sweep granularity — measured 8^3 has
# 1.2x duplication and ~6 cells pierced per bounce ray on colonnade
GRID_RES = 8
# the flat BVH lives in SMEM (1 MB); keep a safety margin for the stacks
MAX_SMEM_NODES = 28000


@dataclass
class SceneBuilder:
    """Mutable host-side staging area (the Device-API equivalent:
    rtNewShape/rtNewMaterial/rtNewLight calls land here)."""
    meshes: list = field(default_factory=list)        # HostMesh
    materials: list = field(default_factory=list)     # MaterialSpec
    lights: list = field(default_factory=list)        # light dicts
    textures: gtex.TextureTableBuilder = field(
        default_factory=gtex.TextureTableBuilder)

    def add_material(self, spec) -> int:
        self.materials.append(spec)
        return len(self.materials) - 1

    def add_mesh(self, m: gmesh.HostMesh) -> int:
        self.meshes.append(m)
        return len(self.meshes) - 1

    def add_light(self, light: dict) -> int:
        """Area lights also create their emissive geometry
        (TriangleLight::createShape via scene_flat.h:133-135)."""
        self.lights.append(light)
        lid = len(self.lights) - 1
        if light['kind'] == 'triangle':
            mat = self.add_material(gmat.make_material(
                'matte', {'reflectance': (1.0, 1.0, 1.0)}))
            # the visible shape's Ng must match the light's emission normal
            # (shapes/triangle.h:43 uses cross(v2-v0, v1-v0) == light Ng),
            # so emit the mesh with swapped winding
            tri = primitives.single_triangle(
                np.asarray(light['v0']), np.asarray(light['v2']),
                np.asarray(light['v1']), material=mat, light=lid)
            self.add_mesh(tri)
        return lid

    def has_billboards(self) -> bool:
        return any(getattr(m, 'face_camera', False) for m in self.meshes)

    def commit(self, force_bvh: Optional[bool] = None,
               leaf_size: int = 64, view_pos=None,
               view_up=(0.0, 1.0, 0.0),
               quality: str = 'high',
               accel: str = 'default') -> "TpuScene":
        """Commit the staged scene. When camera-aligned billboards exist,
        view_pos orients them toward that camera origin (the per-view
        rtUpdatePrimitive + rtCommit of renderer.cpp:550-559).

        quality='high' builds the measured-best high-quality tree for
        the TPU packet kernel (row-aligned leaf packing; see
        geometry/bvh.py::build for the round-4 A/B) — the role
        RTC_SCENE_HIGH_QUALITY plays in the reference's every commit
        (scene_flat.h:90-96).  quality='high-spatial' additionally
        enables SBVH spatial splits (Embree's actual high-quality
        mechanism; measured slower here).  quality='normal' is the
        plain object-split binned-SAH build (also the automatic
        fallback for motion scenes and when the native builder is
        unavailable).

        accel='default' auto-selects: the BVH4 wide collapse
        (ops/pallas_wide.py, the Embree BVH4 analog the .ecs `-accel`
        flag names) when its table fits the SMEM budget and the tree's
        worst-case stack bound, the binary packet kernel otherwise.
        Round 4 measured the wide kernels winning standalone but losing
        2-5% end-to-end and kept them opt-in; round 5's row-aligned
        default tree halved union tri-rows/packet, moving the kernel
        off the pair-test roofline (bench.py utilization metric:
        12.4 of 26.3 Gpairs/s), and the re-measured e2e flipped:
        +2.1% colonnade depth-4, +7.0% sponza depth-10
        (scripts/bench_accel_ab.py) — so bvh4 is now the default
        where it fits.  accel='bvh2' forces the binary kernel;
        accel='bvh4' demands the wide kernel (budget overflow logs a
        warning and falls back, a too-deep tree raises).
        accel='bvh4mb' requires motion geometry and selects the
        union-bounds motion packet path (sphere_motion.ecs's flag,
        made explicit instead of a side effect of motion vertices).
        Unknown accel values raise; the
        committed scene's `accel` field records what actually runs.
        NOTE accel='bvh4' applies to the morton (default) and
        unsorted-bounce traversals; the ablation binnings
        ('treelet'/'dense'/'grid') have no wide-kernel variant and
        keep their own tables (integrator/pathtracer._intersect)."""
        from .utils import hostmem
        from .utils import logging as glog
        hostmem.tune_malloc()   # commit's big temporaries reuse the arena
        if accel not in ('default', 'bvh2', 'bvh4', 'bvh4mb'):
            raise ValueError(
                f"unknown accel {accel!r}: expected 'default' "
                f"(auto-select), 'bvh2', 'bvh4', or 'bvh4mb' "
                f"(motion scenes)")
        meshes = []
        for m in self.meshes:
            if getattr(m, 'face_camera', False) and m.orig_transform is not None:
                if view_pos is not None:
                    xfm = gmesh.billboard_transform(m.orig_transform,
                                                    view_pos, view_up)
                else:
                    xfm = m.orig_transform
                meshes.append(m.transformed(xfm))
            else:
                meshes.append(m)
        packed = gmesh.pack_meshes(meshes)
        n_tris = packed.num_triangles
        has_motion = packed.mv0 is not None
        if accel == 'bvh4mb' and not has_motion:
            raise ValueError(
                "accel='bvh4mb' requires motion geometry (meshes with "
                "motion vertex buffers, trianglemesh_full.cpp:29-33)")
        accel_used = 'bvh2'
        use_bvh = (force_bvh if force_bvh is not None
                   else n_tris > BRUTE_FORCE_MAX_TRIS)

        host = {k: getattr(packed, k) for k in gbvh._PER_TRIANGLE_KEYS
                if getattr(packed, k) is not None}
        bvh_dev = None
        packet = None
        packet_hbm = False
        if use_bvh:
            # motion scenes: union-of-endpoint bounds (the bvh4mb analog,
            # exact for the linear motion of trianglemesh_full.cpp:29-33)
            from .ops import pallas_traverse as _ppt
            mb_bounds = (_ppt.motion_bounds(
                packed.v0, packed.e1, packed.e2, packed.mv0, packed.me1,
                packed.me2) if has_motion else None)
            # skip leaf sizes that provably cannot fit SMEM before paying
            # for a build: a binary tree over ceil(n/L) leaves has at
            # least 2*ceil(n/L)-1 nodes, so any L below that bound would
            # be built only to be discarded (measured: a 3.8M-tri commit
            # at requested leaf 32 spent 5 full builds climbing to 512)
            while (leaf_size < 512
                   and 2 * ((n_tris + leaf_size - 1) // leaf_size) - 1
                       > MAX_SMEM_NODES):
                leaf_size = min(leaf_size * 2, 512)
            bq = quality if not has_motion else 'normal'
            tree = gbvh.build(packed.v0, packed.e1, packed.e2, packed.valid,
                              leaf_size=leaf_size, bounds=mb_bounds,
                              quality=bq)
            # the packet kernel keeps the flat BVH in SMEM (1 MB): grow
            # leaves until the node table fits (big scenes stream their
            # triangles from HBM anyway, so fat leaves cost little)
            # multi-million-triangle scenes keep growing leaves past 128
            # (the node table MUST fit SMEM; fat leaves only add DMA'd
            # rows per visit, the graceful direction at this scale)
            while tree.num_nodes > MAX_SMEM_NODES and leaf_size < 512:
                leaf_size = min(leaf_size * 2, 512)
                tree = gbvh.build(packed.v0, packed.e1, packed.e2,
                                  packed.valid, leaf_size=leaf_size,
                                  bounds=mb_bounds, quality=bq)
            host = gbvh.permute_geom(host, tree.order)
            bvh_dev = gbvh.to_device(tree)
        host['woop'] = gmesh.woop_matrices(host['v0'], host['e1'],
                                           host['e2'], host['valid'])
        from .ops import pallas_traverse as ppt
        if use_bvh and has_motion:
            # motion packet path: union-bounds nodes + 4-per-row motion
            # triangle records, time-aware MT leaf test
            packet = {
                'nodes': jnp.asarray(ppt.pack_nodes(tree)),
                'tris_mb': jnp.asarray(ppt.pack_tris_mb(host)),
            }
            accel_used = 'bvh4mb'
        elif use_bvh:
            # packed arrays for the Pallas packet-traversal kernel
            tris = ppt.pack_tris(host['woop'], host,
                                 pad_rows=ppt._hbm_window(leaf_size))
            packet_hbm = tris.nbytes > TRIS_VMEM_LIMIT_BYTES
            nodes_np = ppt.pack_nodes(tree)
            # treelet cut for the binned incoherent-wavefront paths
            # (bounce>=1 rays; see ops/pallas_traverse.py)
            troots, tboxes = ppt.treelet_cut(nodes_np, max_treelets=64)
            packet = {
                'nodes': jnp.asarray(nodes_np),
                'tris': jnp.asarray(tris),
                'treelet_roots': jnp.asarray(troots),
                'treelet_boxes': jnp.asarray(tboxes),
            }
            # BVH4 wide encoding of the SAME tree — the default when it
            # fits (round-5 e2e flip, see commit docstring).  Unbalanced
            # trees can collapse to MORE SMEM than the binary table
            # (leaf-child slots); guard the same 1 MB budget and fall
            # back to binary.  'default' also tolerates the wide
            # packer's worst-case-stack assert (very deep trees);
            # explicit 'bvh4' propagates it.
            if accel in ('bvh4', 'default'):
                from .ops import pallas_wide as ppw
                nodes4_np = None
                try:
                    nodes4_np = ppw.pack_nodes4(tree)
                except AssertionError:
                    if accel == 'bvh4':
                        raise
                    glog.info("accel auto-select: wide packing failed "
                              "its stack/exactness guards; using the "
                              "binary BVH2 kernel")
                if (nodes4_np is not None
                        and nodes4_np.nbytes <= MAX_SMEM_NODES * 32):
                    packet['nodes4'] = jnp.asarray(nodes4_np)
                    accel_used = 'bvh4'
                elif nodes4_np is not None:
                    log = glog.warning if accel == 'bvh4' else glog.info
                    log("accel=%r: collapsed table %.2f MB exceeds "
                        "the SMEM budget; falling back to the binary "
                        "BVH2 kernel" % (accel,
                                         nodes4_np.nbytes / (1 << 20)))
            # transposed planes for the treelet-binned DENSE sweep (the
            # incoherent fast path, ops/pallas_pairs.py) — VMEM-resident
            # only; HBM-sized scenes keep the packet/stack path
            from .ops import pallas_pairs as ppp
            planes, prows = ppp.pack_planes(host['woop'], host)
            if planes.nbytes <= TRIS_VMEM_LIMIT_BYTES:
                tgs, tge = ppt.treelet_tri_tiles(nodes_np, troots)
                packet['planes'] = jnp.asarray(planes)
                packet['planes_rows'] = jnp.asarray(prows)
                packet['treelet_tile_lo'] = jnp.asarray(tgs)
                packet['treelet_tile_hi'] = jnp.asarray(tge)
            # uniform grid for the DDA + cell-binned dense sweep path
            # (ops/grid.py, ray_binning='grid'): non-overlapping cells
            # give incoherent rays exact near-to-far termination.  Skip
            # before voxelizing when even the undupped planes couldn't
            # fit VMEM (64 B/tri; measured duplication is ~1.2-1.5x)
            if packed.v0.shape[0] * 64 <= TRIS_VMEM_LIMIT_BYTES:
                from .ops import grid as ggrid
                gd = ggrid.build_grid(host, res=GRID_RES)
                if gd['planes'].nbytes <= TRIS_VMEM_LIMIT_BYTES:
                    packet['grid'] = gd
        elif not has_motion:
            # dense Pallas intersector (no BVH): just the packed tri rows
            packet = {
                'tris': jnp.asarray(ppt.pack_tris(host['woop'], host)),
            }
        geom = {k: jnp.asarray(v)
                for k, v in gmesh.add_shade_table(host).items()}

        lights = [glights.set_scene_bounds(l, packed.bbox_lo, packed.bbox_hi)
                  for l in self.lights]
        light_arrays, light_static = _split_lights(lights)

        return TpuScene(
            geom=geom,
            bvh=bvh_dev,
            materials=gmat.build_table(self.materials),
            textures=self.textures.build(),
            light_arrays=light_arrays,
            light_static=light_static,
            leaf_size=leaf_size,
            bbox_lo=tuple(float(x) for x in packed.bbox_lo),
            bbox_hi=tuple(float(x) for x in packed.bbox_hi),
            num_triangles=n_tris,
            packet=packet,
            packet_hbm=packet_hbm,
            any_cull=bool(np.any(np.asarray(packed.cull) != 0)),
            lobe_types=tuple(sorted({lo.type for ms in self.materials
                                     for lo in ms.lobes})),
            accel=accel_used,
        )


def _split_lights(lights):
    """Split light dicts into (array side, hashable static side) so a
    TpuScene flattens into a clean jit pytree.  Array leaves move to the
    device HERE, once — light builders are host-side numpy (a device
    round-trip per light costs seconds on a tunneled TPU)."""
    def _dev(v):
        if isinstance(v, (np.ndarray, np.floating, np.integer)):
            return jnp.asarray(v)
        return jax.tree_util.tree_map(jnp.asarray, v) \
            if isinstance(v, (tuple, list)) else v

    arrays, statics = [], []
    for l in lights:
        a, s = {}, {}
        for k, v in l.items():
            if isinstance(v, (str, bool, int, float)):
                s[k] = v
            else:
                a[k] = _dev(v)
        arrays.append(a)
        statics.append(tuple(sorted(s.items())))
    return arrays, tuple(statics)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TpuScene:
    """Committed immutable scene: a jit-able pytree (device arrays as data,
    light kinds / layout parameters as static metadata)."""
    geom: dict
    bvh: Optional[dict]
    materials: dict
    textures: dict
    light_arrays: list
    light_static: tuple = field(metadata=dict(static=True))
    leaf_size: int = field(metadata=dict(static=True))
    bbox_lo: tuple = field(metadata=dict(static=True))
    bbox_hi: tuple = field(metadata=dict(static=True))
    num_triangles: int = field(metadata=dict(static=True))
    packet: Optional[dict] = None   # Pallas packet-traversal arrays
    # True when the packed triangle rows exceed the VMEM budget: the
    # packet kernels then keep them HBM-resident and DMA leaf windows
    packet_hbm: bool = field(metadata=dict(static=True), default=False)
    # True when any triangle has back-face culling enabled — lets the
    # packet kernels compile away the per-triangle cull test
    any_cull: bool = field(metadata=dict(static=True), default=True)
    # static set of lobe type ids used by any material — lets the shader
    # compile away unused BSDF families (shading/lobes.py sample_lobes)
    lobe_types: Optional[tuple] = field(metadata=dict(static=True),
                                        default=None)
    # which traversal kernel family commit actually selected ('bvh2',
    # 'bvh4', 'bvh4mb') — records SMEM-budget fallbacks observably
    accel: str = field(metadata=dict(static=True), default='bvh2')

    @property
    def lights(self):
        return [dict(**a, **dict(s))
                for a, s in zip(self.light_arrays, self.light_static)]

    @property
    def env_lights(self):
        return [l for l in self.lights if glights.is_env(l)]
