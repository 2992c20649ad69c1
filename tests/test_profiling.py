"""Observability hooks: XLA device tracing + commit metrics (the
reference's fps/mrps prints + Embree BENCHMARK_BUILD analog)."""
import glob
import os

import jax.numpy as jnp

from yulio_raytracer_tpu.utils import profiling
from yulio_raytracer_tpu.io import builtin_scenes


def test_trace_writes_profile(tmp_path):
    import jax
    with profiling.trace(str(tmp_path)):
        with profiling.annotate("tiny-matmul"):
            x = jnp.ones((128, 128))
            jax.block_until_ready(x @ x)
    # jax.profiler.trace writes plugins/profile/<run>/*.xplane.pb
    found = glob.glob(os.path.join(str(tmp_path), '**', '*.xplane.pb'),
                      recursive=True)
    assert found, "no trace artifact written"


def test_commit_stats():
    sb = builtin_scenes.cornell_box()
    scene, st = profiling.committed_stats(sb)
    assert st.triangles == scene.num_triangles
    assert st.total_seconds > 0
    assert st.bvh_nodes == 0           # cornell is below the BVH cutover
    sb2 = builtin_scenes.cornell_box()
    scene2, st2 = profiling.committed_stats(sb2, force_bvh=True,
                                            leaf_size=8)
    assert st2.bvh_nodes > 1
    assert st2.leaf_size == 8
