"""Per-config find_all_spans profiling on the real chip.

Usage: python tools/profile_spans.py [MB] [config ...]
Times count() vs find_all_spans() per bench config and prints a
breakdown; used to drive the round-4 span-path throughput work.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax  # noqa: E402

for _k, _v in (("jax_compilation_cache_dir", _CACHE_DIR),
               ("jax_persistent_cache_min_entry_size_bytes", 0),
               ("jax_persistent_cache_min_compile_time_secs", 0.5)):
    try:
        jax.config.update(_k, _v)
    except Exception:
        pass

from bench import (CONFIGS, build_base, _free_config_state,  # noqa: E402
                   _release_device_corpora)
from coregex_tpu.meta.engine import Engine  # noqa: E402


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    only = set(sys.argv[2:])
    base = build_base()
    reps = max(1, mb * 1024 * 1024 // len(base))
    corpus = base * reps
    arr = np.frombuffer(corpus, dtype=np.uint8)
    n = len(arr)
    print(f"corpus {n/1e6:.0f} MB", flush=True)
    for name, pattern, ref_ms, src in CONFIGS:
        if only and name not in only:
            continue
        eng = None
        try:
            eng = Engine.compile(pattern)
            eng.batch_threshold = 0
            be = eng.batch_engine()
            t0 = time.perf_counter(); c = eng.count(arr)
            tw = time.perf_counter() - t0
            t0 = time.perf_counter(); eng.count(arr)
            tc = time.perf_counter() - t0
            import jax.numpy as jnp

            def dev_spans():
                r = be.find_all_spans_device(arr)
                if r is None:
                    return None
                sd, cnt = r
                # force + checksum in one tiny sync
                s = int(jax.device_get(
                    (sd[:, 0].astype(jnp.uint32).sum()
                     + sd[:, 1].astype(jnp.uint32).sum())))
                return cnt, s

            t0 = time.perf_counter()
            rd = dev_spans()
            td_w = time.perf_counter() - t0
            t0 = time.perf_counter()
            rd = dev_spans()
            td = time.perf_counter() - t0
            md = rd[0] if rd else -1
            devmsg = (f"dev {td*1e3:9.1f} ms ({n/td/1e9:6.2f} GB/s) md={md}"
                      if rd else "dev None")
            t0 = time.perf_counter()
            sp = be.find_all_spans(arr, -1)
            ts = time.perf_counter() - t0
            m = 0 if sp is None else len(sp)
            ok = (m == c) and (md in (-1, c))
            print(f"{name:16} count {tc*1e3:7.1f} ms ({n/tc/1e9:5.2f} GB/s)"
                  f"  {devmsg}"
                  f"  host {ts*1e3:9.1f} ms"
                  f"  m={m} {'ok' if ok else 'COUNT MISMATCH ' + str(c)}"
                  f"  [{eng.strategy}] warm c={tw:.1f}s d={td_w:.1f}s",
                  flush=True)
        except Exception as ex:
            print(f"{name:16} FAILED {type(ex).__name__}: {str(ex)[:180]}",
                  flush=True)
        _free_config_state(eng)
        _release_device_corpora(eng)


if __name__ == "__main__":
    main()
