"""Differential-test oracles with Go rune semantics.

Go regexp matches *runes* over byte haystacks (regexp/syntax semantics):
a valid UTF-8 sequence is one character, and each invalid byte decodes as
one RuneError-width-1 character — so `.` and negated classes match it as
a 1-byte span.  The oracle reproduces this by running Python `re` in str
mode (re.ASCII keeps \\w\\d\\s\\b byte-oriented like Go's) over a
surrogateescape decoding of the haystack, then mapping char offsets back
to byte offsets (each surrogate char encodes exactly the one invalid
byte, matching Go's DecodeRune widths).

Known divergences we translate around:
  * Go's `$` (non-multiline) == absolute end (\\Z in Python); oracle
    patterns use \\Z or (?m).
  * Go's FindAll empty-match rule (regexp.go allMatches) differs from
    Python finditer — we re-implement Go's loop on top of re.search.
  * Go's \\B matches empty text; Python's does not (callers skip).
"""

from __future__ import annotations

import re
from bisect import bisect_left
from functools import lru_cache
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
    if "(?m" not in out:
        # Go's non-multiline $ is absolute end-of-text (\z); Python's $
        # also matches before a final newline.  Rewrite unescaped $
        # outside char classes.
        res = []
        esc = in_class = False
        for ch in out:
            if esc:
                res.append(ch)
                esc = False
                continue
            if ch == "\\":
                res.append(ch)
                esc = True
                continue
            if ch == "[" and not in_class:
                in_class = True
            elif ch == "]" and in_class:
                in_class = False
            if ch == "$" and not in_class:
                res.append(r"\Z")
            else:
                res.append(ch)
        out = "".join(res)
    return out


class Oracle:
    """Compiled Python-re oracle in char space; all public spans are
    byte offsets."""

    def __init__(self, pat: str):
        self.pattern = pat
        self.rx = re.compile(go_pattern(pat), re.ASCII)
        self.groups = self.rx.groups


@lru_cache(maxsize=4096)
def _prep(data: bytes):
    """(decoded str, byte offset of every char boundary [len(s)+1])."""
    s = data.decode("utf-8", "surrogateescape")
    offs = [0]
    for ch in s:
        offs.append(offs[-1] + len(ch.encode("utf-8", "surrogateescape")))
    return s, offs


def _char_pos(offs, bytepos: int) -> int:
    return bisect_left(offs, bytepos)


def compile_oracle(pat: str) -> Oracle:
    return Oracle(pat)


def oracle_search(rx: Oracle, data: bytes, pos: int = 0
                  ) -> Optional[Tuple[int, int]]:
    s, offs = _prep(data)
    m = rx.rx.search(s, _char_pos(offs, pos))
    if not m:
        return None
    a, b = m.span()
    return (offs[a], offs[b])


def go_all_matches(rx: Oracle, data: bytes, limit: int = -1
                   ) -> List[Tuple[int, int]]:
    """Go regexp.allMatches loop using re.search as doExecute (char
    space; Go advances empty matches by one rune == one char here)."""
    s, offs = _prep(data)
    out: List[Tuple[int, int]] = []
    n = len(s)
    pos = 0
    prev_end = -1
    while pos <= n and (limit < 0 or len(out) < limit):
        m = rx.rx.search(s, pos)
        if not m:
            break
        a, b = m.span()
        accept = True
        if b == pos:
            if a == prev_end:
                accept = False
            pos += 1
        else:
            pos = b
        prev_end = b
        if accept:
            out.append((offs[a], offs[b]))
    return out


def go_split(rx: Oracle, data: bytes, n: int = -1) -> List[bytes]:
    if n == 0:
        return []
    if len(rx.pattern) > 0 and len(data) == 0:
        # Go: non-empty expression on empty input -> [""] (regexp.go Split)
        return [b""]
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


def oracle_groups(rx: Oracle, data: bytes, pos: int = 0):
    s, offs = _prep(data)
    m = rx.rx.search(s, _char_pos(offs, pos))
    if not m:
        return None
    out = []
    for i in range(rx.groups + 1):
        sp = m.span(i)
        out.append(None if sp == (-1, -1) else (offs[sp[0]], offs[sp[1]]))
    return out


def go_expand(template: bytes, groups: List[Optional[bytes]],
              names: List[str]) -> bytes:
    """Independent implementation of Go's $-template rules
    (regexp.go:951 Expand): $1 / ${name} / $$; missing groups expand
    empty; malformed ${ is literal."""
    out = bytearray()
    i, n = 0, len(template)
    while i < n:
        b = template[i]
        if b != 0x24:  # '$'
            out.append(b)
            i += 1
            continue
        i += 1
        if i >= n:
            out.append(0x24)
            break
        if template[i] == 0x24:
            out.append(0x24)
            i += 1
            continue
        braced = template[i] == 0x7B  # '{'
        if braced:
            i += 1
        j = i
        while j < n and (chr(template[j]).isalnum() or template[j] == 0x5F):
            j += 1
        name = template[i:j].decode("ascii", "replace")
        if braced:
            if j < n and template[j] == 0x7D:
                j += 1
            else:
                out += b"${"
                continue
        if not name:
            out.append(0x24)
            if braced:
                out.append(0x7B)
            continue
        idx = None
        if name.isdigit():
            idx = int(name)
        else:
            for gi, gn in enumerate(names):
                if gn == name:
                    idx = gi
                    break
        if idx is not None and idx < len(groups) and groups[idx] is not None:
            out += groups[idx]
        i = j
    return bytes(out)


def go_replace_all(rx: Oracle, data: bytes, template: bytes,
                   names: List[str]) -> bytes:
    """Go ReplaceAll oracle: allMatches spans + per-span group bytes +
    independent $-template expansion."""
    s, offs = _prep(data)
    out = bytearray()
    last = 0
    pos = 0
    prev_end = -1
    n = len(s)
    while pos <= n:
        m = rx.rx.search(s, pos)
        if not m:
            break
        a, b = m.span()
        accept = True
        if b == pos:
            if a == prev_end:
                accept = False
            pos += 1
        else:
            pos = b
        prev_end = b
        if accept:
            groups = []
            for i in range(rx.groups + 1):
                g = m.group(i)
                groups.append(None if g is None
                              else g.encode("utf-8", "surrogateescape"))
            out += data[last:offs[a]]
            out += go_expand(template, groups, names)
            last = offs[b]
    out += data[last:]
    return bytes(out)


def oracle_group_bytes(rx: Oracle, data: bytes, start: int, end: int
                       ) -> Optional[List[Optional[bytes]]]:
    """Group texts of the match anchored at byte `start` within
    [start, end) — the oracle for $-template expansion of a known span."""
    s, offs = _prep(data)
    m = rx.rx.match(s, _char_pos(offs, start), _char_pos(offs, end))
    if not m:
        return None
    out: List[Optional[bytes]] = []
    for i in range(rx.groups + 1):
        g = m.group(i)
        out.append(None if g is None
                   else g.encode("utf-8", "surrogateescape"))
    return out
