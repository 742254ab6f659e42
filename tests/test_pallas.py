"""Pallas scan kernel vs scalar reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coregex_tpu.dfa.determinize import determinize
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.ops.dfa_scan import DeviceDFA
from coregex_tpu.ops import pallas_scan
from coregex_tpu.syntax.parser import parse


@pytest.mark.skipif(not pallas_scan.HAVE_PALLAS, reason="no pallas")
@pytest.mark.parametrize("pattern", [r"\d+\.\d+", r"abc", r"[a-c]+x?"])
def test_pallas_scan_matches_scalar(pattern):
    rng = np.random.default_rng(3)
    n_lanes, T = 16, 128
    d = determinize(compile_nfa(parse(pattern), with_captures=False),
                    anchored=False, break_at_match=False)
    dd = DeviceDFA.from_dense(d)
    S, C = dd.num_states, dd.num_classes
    text = rng.choice(list(b"abc 12.5 x\n0.7"),
                      size=n_lanes * T).astype(np.uint8)
    cls = np.asarray(jax.device_get(dd.classes))[text]
    Lc = n_lanes // 8
    cls_tl = cls.reshape(n_lanes, T).T.reshape(T, 8, Lc)
    entries = np.full((8, Lc), int(jax.device_get(dd.starts)[0]), np.int32)
    offsets = np.zeros((8, Lc), np.int32)
    offsets[0, 0] = 5  # exercise warmup gating
    true_steps = np.array([T - 3], np.int32)

    flags, exits = pallas_scan.pallas_scan_once(
        jnp.asarray(np.asarray(jax.device_get(dd.delta))),
        jnp.asarray(np.asarray(jax.device_get(dd.match_on))),
        jnp.asarray(cls_tl), jnp.asarray(entries), jnp.asarray(offsets),
        jnp.asarray(true_steps), S=S, C=C, TT=T, Lc=Lc, Tt=64,
        interpret=True)
    flags = np.asarray(jax.device_get(flags))
    exits = np.asarray(jax.device_get(exits))

    delta = np.asarray(jax.device_get(dd.delta))
    match = np.asarray(jax.device_get(dd.match_on))
    for r in range(8):
        for v in range(Lc):
            s = entries[r, v]
            for t in range(T - 3):
                c = cls_tl[t, r, v]
                live = t >= offsets[r, v]
                want = bool(match[s, c]) and live
                assert bool(flags[t, r, v]) == want, (r, v, t)
                if live:
                    s = delta[s, c]
            assert exits[r, v] == s
