import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, 'assets', 'scenes')


def _run(tool, *args):
    return subprocess.run([sys.executable, os.path.join(REPO, 'tools', tool),
                           *args], capture_output=True, text=True,
                          cwd=REPO, env={**os.environ,
                                         'JAX_PLATFORMS': 'cpu'})


def test_obj2xml_roundtrip(tmp_path):
    xml = str(tmp_path / "cb.xml")
    r = _run('obj2xml.py', os.path.join(ASSETS, 'cornell_box.obj'), xml)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(xml)
    assert os.path.exists(str(tmp_path / "cb.bin"))
    # and the XML loads back through the scene loader (in-process: the
    # CLI surface is already exercised by the obj2xml subprocess above,
    # and each subprocess pays ~6 s of sitecustomize/jax startup)
    obj = str(tmp_path / "back.obj")
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    try:
        import xml2obj
        assert xml2obj.main([xml, obj]) in (0, None)
    finally:
        sys.path.pop(0)
    body = open(obj).read()
    # 15 quads (5 walls + 2 boxes x 5 faces) -> 30 triangles
    assert body.count('\nf ') == 30


def test_vrml2xml(tmp_path):
    wrl = tmp_path / "box.wrl"
    wrl.write_text("""#VRML V2.0 utf8
Transform { children [
 Shape {
  appearance Appearance { material Material { diffuseColor 1 0 0 } }
  geometry IndexedFaceSet {
    coord Coordinate { point [ 0 0 0, 1 0 0, 1 1 0, 0 1 0 ] }
    coordIndex [ 0, 1, 2, 3, -1 ]
  }
 }
] }""")
    xml = str(tmp_path / "box.xml")
    r = _run('vrml2xml.py', str(wrl), xml)
    assert r.returncode == 0, r.stderr
    text = open(xml).read()
    assert '<TriangleMesh>' in text
    assert '1 0 0' in text  # the diffuse color

    # loads through the XML scene loader
    sys.path.insert(0, REPO)
    from yulio_raytracer_tpu.io import xml_scene
    from yulio_raytracer_tpu.scene import SceneBuilder
    sb = SceneBuilder()
    xml_scene.load_xml(xml, sb)
    assert len(sb.meshes) == 1
    assert len(sb.meshes[0].triangles) == 2  # quad fan-triangulated
