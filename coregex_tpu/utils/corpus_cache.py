"""Device corpus cache.

Host->device uploads run at ~50 MB/s through the device runtime, so
re-uploading a corpus on every engine call dominates everything else.  This
LRU caches device buffers (and their flipped copies for reverse scans)
keyed by a cheap content fingerprint of the host array.

The fingerprint samples bytes rather than hashing the whole buffer; a user
mutating a cached numpy array in place between calls with identical
samples would see stale results — documented, and matches the usual
"corpus is immutable during searches" contract.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional, Tuple

import numpy as np

_MAX_ENTRIES = 4
_cache: "OrderedDict[tuple, list]" = OrderedDict()


def _fingerprint(arr: np.ndarray) -> tuple:
    n = len(arr)
    if n == 0:
        return (0,)
    step = max(1, n // 64)
    sample = bytes(arr[::step][:64].tobytes())
    head = bytes(arr[:32].tobytes())
    tail = bytes(arr[-32:].tobytes())
    return (n, hash(sample), hash(head), hash(tail))


def device_corpus(arr: np.ndarray):
    """Upload (or fetch cached) device array for a host uint8 corpus."""
    import jax.numpy as jnp
    key = _fingerprint(arr)
    ent = _cache.get(key)
    if ent is None:
        dev = jnp.asarray(arr)
        ent = [dev, None]
        _cache[key] = ent
        while len(_cache) > _MAX_ENTRIES:
            _cache.popitem(last=False)
    _cache.move_to_end(key)
    return ent[0]


def device_corpus_flipped(arr: np.ndarray):
    """Flipped device copy (for reverse scans), cached alongside."""
    import jax.numpy as jnp
    key = _fingerprint(arr)
    ent = _cache.get(key)
    if ent is None:
        device_corpus(arr)
        ent = _cache[key]
    if ent[1] is None:
        ent[1] = jnp.flip(ent[0])
    return ent[1]


_ascii_cache: "OrderedDict[tuple, bool]" = OrderedDict()


def corpus_is_ascii(arr: np.ndarray) -> bool:
    """Every byte < 0x80 (simd.IsASCII analogue, simd/ascii_amd64.go:12),
    cached per corpus fingerprint — the runtime switch that selects the
    ASCII-projected engine tables (meta/ismatch.go:217 analogue)."""
    if len(arr) == 0:
        return True
    key = _fingerprint(arr)
    v = _ascii_cache.get(key)
    if v is None:
        v = bool(int(arr.max()) < 0x80)
        _ascii_cache[key] = v
        while len(_ascii_cache) > 16:
            _ascii_cache.popitem(last=False)
    return v


def clear():
    _cache.clear()
    _ascii_cache.clear()
