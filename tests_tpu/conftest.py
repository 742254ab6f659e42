"""On-TPU test tier (VERDICT round-2 item 7): runs the Mosaic/MXU
kernels on the REAL chip — the failure class that killed the r2 bench
is invisible to the CPU-forced suite in tests/.

Run with:  python -m pytest tests_tpu -q
(first run pays remote kernel compiles; the persistent .jax_cache makes
repeats fast).  Skips itself when no TPU is attached.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache (same as bench.py)
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")

import jax  # noqa: E402

for _k, _v in (("jax_compilation_cache_dir", _CACHE),
               ("jax_persistent_cache_min_entry_size_bytes", 0),
               ("jax_persistent_cache_min_compile_time_secs", 0.5)):
    try:
        jax.config.update(_k, _v)
    except Exception:
        pass


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU attached")
        for it in items:
            it.add_marker(skip)
