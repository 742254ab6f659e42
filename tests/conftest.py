import os
import sys

# TPU-free test environment: 8 virtual CPU devices for sharding tests.
# XLA_FLAGS is read at backend init; jax may already be imported by the
# environment's sitecustomize, so the platform must be forced via config.
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jit_caches():
    """Release compiled-executable caches between test FILES.

    The suite compiles thousands of distinct XLA CPU programs (one per
    corpus length per kernel); their JITed code segments are mmap'd and
    never unmapped while cached, and a full run can exhaust
    vm.max_map_count — LLVM then dies with 'compilation error: Cannot
    allocate memory' followed by a segfault.  Clearing per module keeps
    the map count bounded; cross-file recompiles are cheap on CPU."""
    yield
    jax.clear_caches()
    from coregex_tpu.ops.span_chain import _I32_CACHE
    _I32_CACHE.clear()
    from coregex_tpu.utils import corpus_cache
    corpus_cache.clear()
    import gc
    gc.collect()
