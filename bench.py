"""Benchmark driver: renders the Cornell golden scene on the available
device and prints ONE JSON line with the headline metric.

Metric: Mrays/s (steady-state, second frame) at 512x512, 32 spp, depth 4 —
the reference's benchmark protocol measured mrps per frame the same way
(integratorrenderer.cpp:101-111, scripts/benchmark.py:360-361).
vs_baseline is measured against the north star's per-chip share:
BASELINE.json targets >= 100 Mrays/s on a v5e-8, i.e. 12.5 Mrays/s/chip.
"""
import json
import sys
import time


BASELINE_MRPS_PER_CHIP = 12.5
WIDTH = HEIGHT = 512
SPP = 32
DEPTH = 4


def main():
    import jax
    from yulio_raytracer_tpu.io import builtin_scenes
    from yulio_raytracer_tpu.integrator import pathtracer as pt
    from yulio_raytracer_tpu import renderer

    scene = builtin_scenes.cornell_box().commit()
    camera = builtin_scenes.cornell_camera(WIDTH, HEIGHT)
    params = pt.PTParams(max_depth=DEPTH)

    # warmup / compile (same static config as the timed frame)
    renderer.render_frame(scene, camera, params, WIDTH, HEIGHT, spp=SPP,
                          seed=0)
    # timed frame
    film, stats = renderer.render_frame(scene, camera, params, WIDTH,
                                        HEIGHT, spp=SPP, seed=1)
    print(json.dumps({
        "metric": "cornell_512_mrps",
        "value": round(stats.mrps, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(stats.mrps / BASELINE_MRPS_PER_CHIP, 4),
    }))


if __name__ == '__main__':
    main()
