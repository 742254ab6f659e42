"""Unicode class tables for \\p{...}.

General categories (L, Lu, Nd, ...) are derived lazily from
`unicodedata.category` over the full codepoint space and cached in-process.
Script names are supported for a common subset via hand-checked ranges;
unknown names return None (parse error), matching the reference's scope
(it delegates to Go's unicode tables; full script coverage is a later round).
"""

from __future__ import annotations

import sys
import unicodedata
from typing import Dict, List, Optional, Tuple

Ranges = Tuple[Tuple[int, int], ...]

_CATEGORY_RANGES: Dict[str, Ranges] = {}
_BUILT = False


def _build_categories() -> None:
    global _BUILT
    if _BUILT:
        return
    open_ranges: Dict[str, List[List[int]]] = {}
    prev_cat: Optional[str] = None
    for cp in range(sys.maxunicode + 1):
        cat = unicodedata.category(chr(cp))
        if cat == "Cn":
            cat = None  # unassigned
        if cat != prev_cat:
            if cat is not None:
                open_ranges.setdefault(cat, []).append([cp, cp])
            prev_cat = cat
        elif cat is not None:
            open_ranges[cat][-1][1] = cp
    for cat, rs in open_ranges.items():
        _CATEGORY_RANGES[cat] = tuple((a, b) for a, b in rs)
    # one-letter supercategories
    supers: Dict[str, List[Tuple[int, int]]] = {}
    for cat, rs in list(_CATEGORY_RANGES.items()):
        supers.setdefault(cat[0], []).extend(rs)
    from .ast import normalize_ranges
    for s, rs in supers.items():
        _CATEGORY_RANGES[s] = normalize_ranges(rs)
    _BUILT = True


# Common scripts, hand-checked basic ranges (sufficient for typical patterns;
# full Unicode script property coverage is future work).
_SCRIPTS: Dict[str, Ranges] = {
    "Latin": ((0x41, 0x5A), (0x61, 0x7A), (0xAA, 0xAA), (0xBA, 0xBA),
              (0xC0, 0xD6), (0xD8, 0xF6), (0xF8, 0x2B8), (0x2E0, 0x2E4),
              (0x1D00, 0x1D25), (0x1D2C, 0x1D5C), (0x1D62, 0x1D65),
              (0x1D6B, 0x1D77), (0x1D79, 0x1DBE), (0x1E00, 0x1EFF),
              (0x2071, 0x2071), (0x207F, 0x207F), (0x2090, 0x209C),
              (0x212A, 0x212B), (0x2132, 0x2132), (0x214E, 0x214E),
              (0x2160, 0x2188), (0x2C60, 0x2C7F), (0xA722, 0xA787),
              (0xA78B, 0xA7CA), (0xAB30, 0xAB5A), (0xFB00, 0xFB06),
              (0xFF21, 0xFF3A), (0xFF41, 0xFF5A)),
    "Greek": ((0x370, 0x373), (0x375, 0x377), (0x37A, 0x37D), (0x37F, 0x37F),
              (0x384, 0x384), (0x386, 0x386), (0x388, 0x38A), (0x38C, 0x38C),
              (0x38E, 0x3A1), (0x3A3, 0x3E1), (0x3F0, 0x3FF),
              (0x1D26, 0x1D2A), (0x1D5D, 0x1D61), (0x1D66, 0x1D6A),
              (0x1F00, 0x1F15), (0x1F18, 0x1F1D), (0x1F20, 0x1F45),
              (0x1F48, 0x1F4D), (0x1F50, 0x1F57), (0x1F59, 0x1F59),
              (0x1F5B, 0x1F5B), (0x1F5D, 0x1F5D), (0x1F5F, 0x1F7D),
              (0x1F80, 0x1FB4), (0x1FB6, 0x1FC4), (0x1FC6, 0x1FD3),
              (0x1FD6, 0x1FDB), (0x1FDD, 0x1FEF), (0x1FF2, 0x1FF4),
              (0x1FF6, 0x1FFE), (0x2126, 0x2126)),
    "Cyrillic": ((0x400, 0x484), (0x487, 0x52F), (0x1C80, 0x1C88),
                 (0x2DE0, 0x2DFF), (0xA640, 0xA69F), (0xFE2E, 0xFE2F)),
    "Han": ((0x2E80, 0x2E99), (0x2E9B, 0x2EF3), (0x2F00, 0x2FD5),
            (0x3005, 0x3005), (0x3007, 0x3007), (0x3021, 0x3029),
            (0x3038, 0x303B), (0x3400, 0x4DBF), (0x4E00, 0x9FFF),
            (0xF900, 0xFA6D), (0xFA70, 0xFAD9), (0x20000, 0x2A6DF)),
    "Hiragana": ((0x3041, 0x3096), (0x309D, 0x309F),),
    "Katakana": ((0x30A1, 0x30FA), (0x30FD, 0x30FF), (0x31F0, 0x31FF),
                 (0xFF66, 0xFF6F), (0xFF71, 0xFF9D)),
    "Arabic": ((0x600, 0x604), (0x606, 0x60B), (0x60D, 0x61A),
               (0x61C, 0x61E), (0x620, 0x63F), (0x641, 0x64A),
               (0x656, 0x66F), (0x671, 0x6DC), (0x6DE, 0x6FF),
               (0x750, 0x77F), (0x8A0, 0x8B4), (0xFB50, 0xFBC1),
               (0xFDF0, 0xFDFD), (0xFE70, 0xFE74), (0xFE76, 0xFEFC)),
    "Hebrew": ((0x591, 0x5C7), (0x5D0, 0x5EA), (0x5EF, 0x5F4),
               (0xFB1D, 0xFB36), (0xFB38, 0xFB3C), (0xFB3E, 0xFB3E),
               (0xFB40, 0xFB41), (0xFB43, 0xFB44), (0xFB46, 0xFB4F)),
    "Hangul": ((0x1100, 0x11FF), (0x3131, 0x318E), (0xA960, 0xA97C),
               (0xAC00, 0xD7A3), (0xD7B0, 0xD7C6), (0xD7CB, 0xD7FB),
               (0xFFA0, 0xFFBE), (0xFFC2, 0xFFC7), (0xFFCA, 0xFFCF),
               (0xFFD2, 0xFFD7), (0xFFDA, 0xFFDC)),
    "Thai": ((0xE01, 0xE3A), (0xE40, 0xE5B),),
    "Devanagari": ((0x900, 0x950), (0x953, 0x963), (0x966, 0x97F),
                   (0xA8E0, 0xA8FF)),
}

_SPECIAL: Dict[str, Ranges] = {
    "Any": ((0, 0x10FFFF),),
}

# Full script coverage (Go delegates to its unicode tables,
# nfa/compile.go:600-975; we delegate to the `regex` module's Unicode
# script property data): ranges are derived lazily per requested script
# by scanning one string containing every scalar value with
# \p{Script}+ and mapping match spans back to codepoints.  Exact per
# the Unicode data the regex module ships; cached in-process.
_SCRIPT_CACHE: Dict[str, Optional[Ranges]] = {}
_ALL_CPS = None  # (string of all scalar values, built lazily)


def _all_scalars() -> str:
    global _ALL_CPS
    if _ALL_CPS is None:
        _ALL_CPS = ("".join(map(chr, range(0, 0xD800)))
                    + "".join(map(chr, range(0xE000, 0x110000))))
    return _ALL_CPS


def _idx_to_cp(i: int) -> int:
    return i if i < 0xD800 else i + 0x800


def _script_ranges(name: str) -> Optional[Ranges]:
    if name in _SCRIPT_CACHE:
        return _SCRIPT_CACHE[name]
    out: Optional[Ranges] = None
    try:
        import regex as _re_mod
        pat = _re_mod.compile(r"\p{%s}+" % name, _re_mod.V0)
        s = _all_scalars()
        rs = []
        for m in pat.finditer(s):
            a, b = m.span()
            lo, hi = _idx_to_cp(a), _idx_to_cp(b - 1)
            if lo < 0xD800 <= hi:
                # split runs crossing the surrogate gap: D800-DFFF are
                # not scalar values and must not enter class ranges
                rs.append((lo, 0xD7FF))
                rs.append((0xE000, hi))
            else:
                rs.append((lo, hi))
        out = tuple(rs) if rs else None
    except Exception:
        out = _SCRIPTS.get(name)
    _SCRIPT_CACHE[name] = out
    return out


def lookup(name: str) -> Optional[Ranges]:
    if name in _SPECIAL:
        return _SPECIAL[name]
    if len(name) <= 2 and name[:1].isupper():
        _build_categories()
        return _CATEGORY_RANGES.get(name)
    return _script_ranges(name)
