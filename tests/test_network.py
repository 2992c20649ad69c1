"""Distributed TCP rendering: N local servers, one client (the reference's
multi-node testability pattern — run rt_server locally N times and
-connect localhost:p1 localhost:p2, SURVEY.md section 4)."""
import threading

import numpy as np
import pytest

from yulio_raytracer_tpu.parallel import network
from yulio_raytracer_tpu.io import builtin_scenes
from yulio_raytracer_tpu.integrator import pathtracer as pt
from yulio_raytracer_tpu import renderer
from yulio_raytracer_tpu.film import accum


def test_active_rows_partition():
    h = 64
    n = 3
    all_rows = np.concatenate([network.active_rows(h, i, n)
                               for i in range(n)])
    assert sorted(all_rows.tolist()) == list(range(h))
    # 4-row bands: rows 0-3 on server 0, 4-7 on server 1, ...
    assert set(network.active_rows(h, 0, n)[:4]) == {0, 1, 2, 3}
    assert set(network.active_rows(h, 1, n)[:4]) == {4, 5, 6, 7}


def test_two_server_render_matches_local():
    ports = [19471, 19472]
    servers = [network.RenderServer(p, single_connection=True)
               for p in ports]
    threads = [threading.Thread(target=s.serve_forever, daemon=True)
               for s in servers]
    for t in threads:
        t.start()

    sb = builtin_scenes.cornell_box(with_boxes=False)
    camera = builtin_scenes.cornell_camera(32, 32)
    params = pt.PTParams(max_depth=2)

    client = network.NetworkClient([('127.0.0.1', p) for p in ports])
    client.set_scene(sb)
    img, weight = client.render(camera, params, 32, 32, spp=2, seed=3)
    client.close()
    for s in servers:
        s.stop()

    assert (weight == 2.0).all()
    # the merged distributed render is bit-identical to a local render
    scene = sb.commit()
    film, _ = renderer.render_frame(scene, camera, params, 32, 32, spp=2,
                                    seed=3)
    local = np.asarray(film.rgb_sum)
    np.testing.assert_allclose(img, local, atol=1e-5)


def test_rgbe8_roundtrip():
    rs = np.random.RandomState(0)
    rgb = (rs.rand(16, 16, 3) * 50).astype(np.float32)
    rgb[0, 0] = 0.0
    dec = network.rgbe8_decode(network.rgbe8_encode(rgb))
    # shared-exponent codec: absolute error bounded by max_channel/128
    bound = rgb.max(axis=-1, keepdims=True) / 128.0 + 1e-6
    assert (np.abs(dec - rgb) <= bound).all()
    np.testing.assert_array_equal(dec[0, 0], 0.0)
