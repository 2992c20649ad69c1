import os

import numpy as np
import jax.numpy as jnp
import pytest

from yulio_raytracer_tpu.io import ecs, image, obj, builtin_scenes
from yulio_raytracer_tpu.scene import SceneBuilder
from yulio_raytracer_tpu.shading import lobes as lb

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'assets', 'scenes')


def test_ppm_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(8, 12, 3).astype(np.float32)
    p = str(tmp_path / "t.ppm")
    image.store(p, img)
    back = image.load(p)
    assert back.shape == (8, 12, 3)
    np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)


def test_pfm_roundtrip(tmp_path):
    img = (np.random.RandomState(1).rand(6, 9, 3) * 100).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    image.store(p, img)
    back = image.load(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_png_roundtrip(tmp_path):
    img = np.random.RandomState(2).rand(5, 7, 3).astype(np.float32)
    p = str(tmp_path / "t.png")
    image.store(p, img)
    back = image.load(p)
    np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)


def test_parse_cornell_ecs():
    settings, sb = ecs.parse_ecs(os.path.join(ASSETS, 'cornell_box.ecs'))
    assert settings.depth == 2
    assert settings.fov == 37.0
    assert settings.cam_pos == (278.0, 273.0, -800.0)
    # quadlight -> two triangle lights (+their emissive geometry)
    kinds = [l['kind'] for l in sb.lights]
    assert kinds == ['triangle', 'triangle']
    scene = sb.commit()
    # 5 walls * 2 + 2 boxes * 5 quads * 2 + 2 light tris = 32 live tris
    assert int(np.asarray(scene.geom['valid']).sum()) == 32


def test_obj_materials_mapped():
    sb = SceneBuilder()
    obj.load_obj(os.path.join(ASSETS, 'cornell_box.obj'), sb)
    # materials: default matte + white/red/green
    assert len(sb.materials) == 4
    types = np.asarray(sb.commit().materials['lobe_type'])
    assert (types[:, 0] == lb.NONE).sum() == 0  # every material has a lobe


def test_parse_sphere_glass_xml():
    settings = ecs.RenderSettings()
    sb = SceneBuilder()
    ecs.load_scene_file(os.path.join(ASSETS, 'sphere_glass.xml'),
                        settings, sb)
    kinds = [l['kind'] for l in sb.lights]
    assert kinds == ['ambient']
    scene = sb.commit()
    assert scene.num_triangles > 4000       # tessellated sphere + floor
    # glass material present with medium interface
    assert bool(np.asarray(scene.materials['media']).any())
    # textured floor material has a texture bound
    assert int(np.asarray(scene.materials['lobe_tex']).max()) >= 0


def test_ecs_include_recursion(tmp_path):
    inner = tmp_path / "view.ecs"
    inner.write_text("-vp 1 2 3 -fov 45\n")
    outer = tmp_path / "main.ecs"
    outer.write_text(f"-c view.ecs\n-spp 4 # comment\n")
    settings, sb = ecs.parse_ecs(str(outer))
    assert settings.cam_pos == (1.0, 2.0, 3.0)
    assert settings.fov == 45.0
    assert settings.spp == 4


def test_unknown_tag_raises():
    ts = ecs.TokenStream("-bogus 1")
    with pytest.raises(ValueError, match="unknown command-line tag"):
        ecs.parse(ts, ecs.RenderSettings(), SceneBuilder())


def test_reference_model_ecs_parses_if_available():
    """The actual golden .ecs files from the reference tree must parse
    (pure data; the geometry blobs they reference may be stripped)."""
    ref = "/root/reference/models"
    if not os.path.isdir(ref):
        pytest.skip("reference models not present")
    settings, sb = ecs.parse_ecs(os.path.join(ref, 'sphere_glass.ecs'))
    assert settings.renderer == 'pathtracer'
    assert [l['kind'] for l in sb.lights].count('hdrilight') == 0
    # scene contains the glass sphere + floor + HDRI light
    kinds = [l['kind'] for l in sb.lights]
    assert 'hdri' in kinds


def test_all_reference_ecs_parse():
    """Every golden .ecs in the reference tree parses (geometry blobs may
    be stripped — scene files that reference them are skipped)."""
    ref = "/root/reference/models"
    if not os.path.isdir(ref):
        pytest.skip("reference models not present")
    parsed = 0
    for fn in sorted(os.listdir(ref)):
        if not fn.endswith('.ecs'):
            continue
        path = os.path.join(ref, fn)
        try:
            settings, sb = ecs.parse_ecs(path)
            parsed += 1
        except FileNotFoundError:
            continue   # references a stripped blob (e.g. cornell_box.obj)
    assert parsed >= 5


def test_reference_xml_scenes_load():
    ref = "/root/reference/models"
    if not os.path.isdir(ref):
        pytest.skip("reference models not present")
    from yulio_raytracer_tpu.io import xml_scene
    ok = 0
    for fn in ('sphere_glass.xml', 'sphere_mirror.xml',
               'sphere_carpaint.xml', 'cornell_box_spheres.xml',
               'test_stereo.xml', 'test_transmissive.xml',
               'sphere_motion.xml'):
        path = os.path.join(ref, fn)
        if not os.path.exists(path):
            continue
        sb = SceneBuilder()
        xml_scene.load_xml(path, sb)
        assert len(sb.meshes) > 0 or len(sb.lights) > 0, fn
        ok += 1
    assert ok >= 5
