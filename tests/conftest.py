"""Test config: force an 8-virtual-device CPU platform BEFORE jax import.

Multi-chip sharding paths are exercised on a host-platform mesh
(xla_force_host_platform_device_count=8); the driver separately validates
the same code via __graft_entry__.dryrun_multichip.

On-TPU tier: `YRT_TPU_TESTS=1 pytest -m tpu tests/` keeps the real
backend (no CPU forcing) and runs the COMPILED Pallas kernels on the
chip (tests/test_tpu.py) — kernel-lowering regressions fail a named
test instead of dimming a benchmark.  Never run concurrently with
another TPU process (the axon device grant is exclusive).
"""
import os
import sys

_TPU_TIER = bool(os.environ.get("YRT_TPU_TESTS"))
if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
# Silence XLA:CPU AOT-loader warnings emitted on every persistent-cache
# hit (the compile/host feature lists differ only in the XLA pseudo-
# features +prefer-no-{scatter,gather}; loads succeed on this machine).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_TIER and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Keep big numpy buffers in the heap arena: this host's fresh-page
# faults run at MB/s, and with default thresholds every large temporary
# is a fresh mmap (utils/hostmem.py docstring has the measurements).
from yulio_raytracer_tpu.utils import hostmem  # noqa: E402

hostmem.tune_malloc()

# The axon TPU plugin (sitecustomize) sets jax_platforms programmatically,
# which beats the env var — override it back to CPU before first backend use.
import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-dominated on this 1-core
# box (~27 min cold, every test re-jitting its render graphs).  Warm runs
# reload XLA:CPU AOT results from disk instead, the same mechanism
# api/session.py uses on TPU (VERDICT r2 item 5/9).  The TPU tier shares
# bench.py's cache so its kernels are usually pre-compiled.
_cache = os.environ.get(
    "JAX_TEST_CACHE_DIR",
    "/root/.cache/jax_comp" if _TPU_TIER
    else os.path.expanduser("~/.cache/yulio_test_jax_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
