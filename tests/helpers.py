"""Differential-test oracles.

Python `re` over *bytes* shares Go regexp's core semantics for our supported
subset (leftmost-first, ASCII \\w\\d\\s\\b on bytes).  Known divergences we
translate around:
  * Go's `$` (non-multiline) == absolute end (\\Z in Python); oracle
    patterns use \\Z or (?m).
  * Go's FindAll empty-match rule (regexp.go allMatches) differs from
    Python finditer — we re-implement Go's loop on top of re.search.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple


def rune_width(b: bytes, pos: int) -> int:
    if pos >= len(b):
        return 0
    c = b[pos]
    if c < 0x80:
        return 1
    if c < 0xC0:
        return 1
    if c < 0xE0:
        return 2
    if c < 0xF0:
        return 3
    return 4


_POSIX = {
    "[:alpha:]": "a-zA-Z", "[:digit:]": "0-9", "[:alnum:]": "0-9a-zA-Z",
    "[:space:]": r" \t\n\r\f\v", "[:upper:]": "A-Z", "[:lower:]": "a-z",
    "[:xdigit:]": "0-9a-fA-F", "[:word:]": r"0-9A-Za-z_",
    "[:punct:]": r"!-/:-@\[-`{-~", "[:blank:]": r" \t",
}


def go_pattern(pat: str) -> str:
    """Translate a Go pattern into an equivalent Python pattern where they
    diverge ($ vs \\Z outside multiline; \\z; POSIX classes)."""
    out = pat.replace(r"\z", r"\Z")
    for k, v in _POSIX.items():
        out = out.replace(k, v)
    return out


def compile_oracle(pat: str):
    return re.compile(go_pattern(pat).encode("utf-8"))


def oracle_search(rx, data: bytes, pos: int = 0
                  ) -> Optional[Tuple[int, int]]:
    m = rx.search(data, pos)
    return m.span() if m else None


def go_all_matches(rx, data: bytes, limit: int = -1
                   ) -> List[Tuple[int, int]]:
    """Go regexp.allMatches loop using re.search as doExecute."""
    out: List[Tuple[int, int]] = []
    n = len(data)
    pos = 0
    prev_end = -1
    while pos <= n and (limit < 0 or len(out) < limit):
        m = rx.search(data, pos)
        if not m:
            break
        s, e = m.span()
        accept = True
        if e == pos:
            if s == prev_end:
                accept = False
            w = rune_width(data, pos)
            if w > 0:
                pos += w
            else:
                pos = n + 1
        else:
            pos = e
        prev_end = e
        if accept:
            out.append((s, e))
    return out


def go_split(rx, data: bytes, n: int = -1) -> List[bytes]:
    if n == 0:
        return []
    spans = go_all_matches(rx, data)
    out: List[bytes] = []
    beg = 0
    end = 0
    for s, e in spans:
        if n > 0 and len(out) >= n - 1:
            break
        end = s
        if e != 0:
            out.append(data[beg:end])
            beg = e
    if end != len(data):
        out.append(data[beg:])
    return out


def oracle_groups(rx, data: bytes, pos: int = 0):
    m = rx.search(data, pos)
    if not m:
        return None
    out = []
    for i in range(rx.groups + 1):
        sp = m.span(i)
        out.append(None if sp == (-1, -1) else sp)
    return out
