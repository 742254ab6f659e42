"""Randomized differential conformance (fuzz_stdlib_test.go analogue):
generate random patterns from a Go-safe grammar + random texts, require
span equality with the oracle across find/find_all."""

import random

import pytest

from coregex_tpu.meta.engine import Engine

from helpers import (compile_oracle, go_all_matches, go_replace_all,
                     go_split, oracle_groups, oracle_search)

ATOMS = ["a", "b", "c", "x", "1", "2", r"\d", r"\w", r"\s", ".",
         "[ab]", "[a-c]", "[^a]", "[0-9a-f]"]
ANCHOR_ATOMS = [r"\b", r"\B"]
QUANTS = ["", "", "", "*", "+", "?", "{1,3}", "{2}", "*?", "+?"]


def gen_pattern(rng: random.Random, depth: int = 0) -> str:
    n = rng.randint(1, 4)
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.12 and depth < 2:
            inner = gen_pattern(rng, depth + 1)
            wrap = rng.choice(["({})", "(?:{})"])
            # no quantifier on groups: Python's backtracking oracle goes
            # exponential on nested quantifiers like (a*)+
            parts.append(wrap.format(inner))
        elif r < 0.2 and depth < 2:
            a = gen_pattern(rng, depth + 1)
            b = gen_pattern(rng, depth + 1)
            parts.append(f"(?:{a}|{b})")
        elif r < 0.25:
            parts.append(rng.choice(ANCHOR_ATOMS))
        else:
            parts.append(rng.choice(ATOMS) + rng.choice(QUANTS))
    return "".join(parts)


def gen_text(rng: random.Random) -> bytes:
    alphabet = b"aabbccxx112  .\n-f"
    n = rng.randint(0, 40)
    return bytes(rng.choice(alphabet) for _ in range(n))


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_differential(seed):
    rng = random.Random(seed * 7919 + 13)
    for it in range(25):
        pat = gen_pattern(rng)
        try:
            eng = Engine.compile(pat)
            rx = compile_oracle(pat)
        except Exception:
            continue  # oracle-incompatible pattern; skip
        for _ in range(8):
            text = gen_text(rng)
            if r"\B" in pat and text == b"":
                # Go: \B matches the empty string (both sides non-word);
                # Python's re does not — ours follows Go.
                continue
            exp = oracle_search(rx, text)
            got = eng.find_index(text)
            assert got == exp, (
                f"seed={seed} it={it} find p={pat!r} t={text!r}: "
                f"{got} vs {exp}")
            exp_all = go_all_matches(rx, text)
            got_all = eng.find_all_index(text) or []
            assert got_all == exp_all, (
                f"seed={seed} it={it} findall p={pat!r} t={text!r}: "
                f"{got_all} vs {exp_all}")


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_submatch_replace_split(seed):
    """FuzzFindSubmatchStdlib / FuzzReplaceStdlib / FuzzSplitStdlib
    analogues (fuzz_stdlib_test.go): differential over the capture,
    replace, and split APIs."""
    rng = random.Random(seed * 104729 + 7)
    for it in range(20):
        pat = gen_pattern(rng)
        try:
            eng = Engine.compile(pat)
            rx = compile_oracle(pat)
        except Exception:
            continue
        names = eng.subexp_names()
        tmpl = b"<$1|$2>" if eng.num_subexp >= 2 else b"[$0]"
        for _ in range(6):
            text = gen_text(rng)
            if r"\B" in pat and text == b"":
                continue
            exp_g = oracle_groups(rx, text)
            got_g = eng.find_submatch_index(text)
            assert got_g == exp_g, (
                f"seed={seed} it={it} submatch p={pat!r} t={text!r}: "
                f"{got_g} vs {exp_g}")
            exp_r = go_replace_all(rx, text, tmpl, names)
            got_r = eng.replace_all(text, tmpl)
            assert got_r == exp_r, (
                f"seed={seed} it={it} replace p={pat!r} t={text!r}: "
                f"{got_r} vs {exp_r}")
            exp_s = go_split(rx, text)
            got_s = eng.split(text)
            assert got_s == exp_s, (
                f"seed={seed} it={it} split p={pat!r} t={text!r}: "
                f"{got_s} vs {exp_s}")


# extended grammar sweep: case-fold flag, counted repeats on groups,
# multiline anchors, dot — shapes the base grammar omits (closer to the
# reference's full fuzz seed list, fuzz_stdlib_test.go:31-108)
FOLD_ATOMS = ["a", "B", "[a-d]", "[XY]", "foo", "Bar"]


def gen_pattern_ext(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 4)):
        r = rng.random()
        if r < 0.15:
            inner = rng.choice(ATOMS) + rng.choice(["", "+", "?"])
            parts.append("(%s)%s" % (inner,
                                     rng.choice(["{1,2}", "{2}", "{0,3}"])))
        elif r < 0.25:
            parts.append(rng.choice(["(?m)^", "(?m)$", "^", "$"])
                         if not parts else rng.choice(["$", "(?m)$"]))
        elif r < 0.4:
            parts.append("(?i:%s)" % rng.choice(FOLD_ATOMS))
        else:
            parts.append(rng.choice(ATOMS) + rng.choice(QUANTS))
    return "".join(parts)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_extended_grammar(seed):
    rng = random.Random(seed * 31337 + 5)
    for it in range(20):
        pat = gen_pattern_ext(rng)
        try:
            eng = Engine.compile(pat)
            rx = compile_oracle(pat)
        except Exception:
            continue
        for _ in range(8):
            text = gen_text(rng)
            if r"\B" in pat and text == b"":
                continue
            exp = oracle_search(rx, text)
            got = eng.find_index(text)
            assert got == exp, (
                f"seed={seed} it={it} find p={pat!r} t={text!r}: "
                f"{got} vs {exp}")
            exp_all = go_all_matches(rx, text)
            got_all = eng.find_all_index(text) or []
            assert got_all == exp_all, (
                f"seed={seed} it={it} findall p={pat!r} t={text!r}: "
                f"{got_all} vs {exp_all}")
            assert eng.count(text) == len(exp_all)
