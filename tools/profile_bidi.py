"""Per-stage timing of the bidirectional span path on the real chip.

Stages: forward span scan / bidi_ends (symbols + chain) / reverse flag
scan / assemble — each block_until_ready'd so the attribution is real.
`COREGEX_TPU_PB_MB` sizes the corpus (default 256).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(out):
    """block_until_ready does NOT reliably wait through the axon
    tunnel; a scalar device_get is the only trustworthy fence (costs
    the ~26 ms tunnel round trip — subtract the measured floor)."""
    import jax
    import jax.numpy as jnp
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ndim")]
    acc = None
    for x in leaves:
        v = jnp.ravel(x)[0].astype(jnp.int32) if x.ndim else \
            x.astype(jnp.int32)
        acc = v if acc is None else acc + v
    jax.device_get(acc)


def t(fn, reps=3):
    out = fn()
    _sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    from bench import build_base
    from coregex_tpu.meta.engine import Engine
    from coregex_tpu.ops.bytescan import _bucket
    from coregex_tpu.ops.compact2 import _bucket_up
    from coregex_tpu.ops.span_chain import (_dev_i32, bidi_assemble,
                                            bidi_ends)
    from coregex_tpu.utils.corpus_cache import (device_corpus,
                                                device_corpus_flipped)

    import jax.numpy as jnp
    z = jax.device_put(jnp.int32(0))
    floor, _ = t(lambda: z + 1, reps=5)
    print(f"sync floor: {floor*1e3:.1f} ms", flush=True)

    mb = int(os.environ.get("COREGEX_TPU_PB_MB", "256"))
    base = build_base()
    reps = max(1, mb * 1024 * 1024 // len(base))
    arr = np.frombuffer(base * reps, dtype=np.uint8)
    n = len(arr)
    print(f"corpus {n/1e6:.0f} MB", flush=True)

    for pat in (r"\d+\.\d+\.\d+\.\d+", r"\d+.\d+.\d+"):
        e = Engine.compile(pat)
        e.batch_threshold = 0
        be = e.batch_engine()
        be._bidi_ascii = True
        be._bidi_data = arr
        dev = device_corpus(arr)
        devf = device_corpus_flipped(arr)
        ssc = be._span_scanner_for_corpus()
        rsc = be._rev_flag_scanner(True) or be._rev_flag_scanner()
        print(pat, "ssc tree:", ssc.dsd.tree_ops(),
              "rev tree:", rsc.tables.NSEG + rsc.tables.S
              + rsc.tables.R * (rsc.tables.Cp + 1), flush=True)

        dt, out = t(lambda: ssc.scan(dev))
        fw, gw, nev_d, total_d, kind_d, conv = out
        total = int(jax.device_get(total_d))
        print(f"  fwd scan   {dt*1e3:8.1f} ms  {n/dt/1e9:6.2f} GB/s "
              f"(total={total}, conv={bool(jax.device_get(conv))})",
              flush=True)

        capM = _bucket(total + 1, 16)
        nwb = _bucket_up(max(-(-n // 32), 1))
        nwb1 = _bucket_up(max(-(-(n + 1) // 32), 1))
        n_dev = _dev_i32(n)
        dt, outE = t(lambda: bidi_ends(fw, gw, devf, rsc.byte_bounds(),
                                       n_dev, total_d, kind_d, capM,
                                       nwb, nwb1))
        ends_c, cntF_d, syms, rw, okA = outE
        print(f"  bidi_ends  {dt*1e3:8.1f} ms  {n/dt/1e9:6.2f} GB/s "
              f"(okA={bool(jax.device_get(okA))})", flush=True)

        dt, outR = t(lambda: rsc.scan_words_syms(syms, n))
        fw_rev, _i, conv2, rhint = outR
        dt, outR = t(lambda: rsc.scan_words_syms(
            syms, n, entries_hint=rhint))
        print(f"  rev hinted {dt*1e3:8.1f} ms  {n/dt/1e9:6.2f} GB/s",
              flush=True)
        fw_rev = outR[0]
        print(f"  rev scan   {dt*1e3:8.1f} ms  {n/dt/1e9:6.2f} GB/s "
              f"(conv2={bool(jax.device_get(conv2))})", flush=True)

        dt, outA = t(lambda: bidi_assemble(ends_c, cntF_d, rw, fw_rev,
                                           n_dev, capM, nwb1))
        spans, cnt_d, ok = outA
        print(f"  assemble   {dt*1e3:8.1f} ms  "
              f"(ok={bool(jax.device_get(ok))})", flush=True)

        dt, _ = t(lambda: be.find_all_spans_device(arr, defer_ok=True))
        print(f"  END2END    {dt*1e3:8.1f} ms  {n/dt/1e9:6.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
