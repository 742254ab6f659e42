"""Mesh-sharded scan correctness on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from coregex_tpu.dfa.determinize import determinize
from coregex_tpu.nfa.thompson import compile_nfa
from coregex_tpu.ops.dfa_scan import DeviceDFA
from coregex_tpu.parallel.shard import (default_mesh, make_sharded_count,
                                        make_sharded_flags)
from coregex_tpu.syntax.parser import parse


def build_fwd_all(pattern):
    nfa = compile_nfa(parse(pattern), with_captures=False)
    return determinize(nfa, anchored=False, break_at_match=False)


@pytest.mark.parametrize("pattern", [r"abc", r"\d+\.\d+", r"\bfoo\b",
                                     r"(?m)^x.*"])
def test_sharded_count_matches_host(pattern):
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(1)
    text = rng.choice(list(b"abc foo 12.5\nx9 "), size=16_384).astype(np.uint8)
    dense = build_fwd_all(pattern)
    ddfa = DeviceDFA.from_dense(dense)
    mesh = default_mesh()
    fn = make_sharded_count(mesh, ddfa)
    got = int(fn(np.asarray(text)))
    exp = int(build_fwd_all(pattern).scan_all_ends(text).sum())
    assert got == exp, f"{pattern}: sharded {got} vs host {exp}"


def test_sharded_flags_exact():
    rng = np.random.default_rng(2)
    text = rng.choice(list(b"ab 12.5 cd\n"), size=8_192).astype(np.uint8)
    dense = build_fwd_all(r"\d+\.\d+")
    ddfa = DeviceDFA.from_dense(dense)
    fn = make_sharded_flags(default_mesh(), ddfa)
    got = np.asarray(jax.device_get(fn(np.asarray(text))))
    exp = dense.scan_all_ends(text)[:-1]
    assert np.array_equal(got, exp)
