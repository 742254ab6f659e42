"""Regenerate coregex_tpu/syntax/_script_tables.py from the `regex` module.

The reference inherits Go's complete `unicode.Scripts` tables via
regexp/syntax (/root/reference/nfa/compile.go:600-975).  We vendor the
equivalent data — every Unicode script property value with its full range
set — generated offline from the `regex` module's Unicode data, so the
framework has no runtime dependency on `regex`.

Run:  python tools/gen_unicode_scripts.py
"""

from __future__ import annotations

import sys
from collections import defaultdict

import regex
import regex._regex_core as _core

OUT = "coregex_tpu/syntax/_script_tables.py"

# one string containing every Unicode scalar value (surrogates excluded)
_ALL = "".join(map(chr, range(0, 0xD800))) + "".join(
    map(chr, range(0xE000, 0x110000)))


def _idx_to_cp(i: int) -> int:
    return i if i < 0xD800 else i + 0x800


def ranges_for(script: str):
    pat = regex.compile(r"\p{Script=%s}+" % script, regex.V0)
    rs = []
    for m in pat.finditer(_ALL):
        a, b = m.span()
        lo, hi = _idx_to_cp(a), _idx_to_cp(b - 1)
        if lo < 0xD800 <= hi:
            rs.append((lo, 0xD7FF))
            rs.append((0xE000, hi))
        else:
            rs.append((lo, hi))
    return tuple(rs)


def main() -> None:
    _, values = _core.PROPERTIES["SCRIPT"]
    # group alias spellings by script id; pick ranges once per id
    by_id = defaultdict(list)
    for name, vid in values.items():
        by_id[vid].append(name)
    ids = sorted(by_id)
    alias_to_idx = {}
    range_sets = []
    for idx, vid in enumerate(ids):
        names = sorted(by_id[vid])
        rs = ranges_for(names[0])
        range_sets.append(rs)
        for nm in names:
            alias_to_idx[nm] = idx
    n_nonempty = sum(1 for rs in range_sets if rs)
    with open(OUT, "w") as f:
        f.write('"""Unicode script property ranges (GENERATED — do not '
                'edit).\n\nRegenerate with tools/gen_unicode_scripts.py.  '
                'Data source: the `regex`\nmodule version %s (Unicode %s).'
                '\n"""\n\n' % (regex.__version__,
                               getattr(regex, "__doc__", "") and "15+"))
        f.write("SCRIPT_ALIASES = {\n")
        for nm in sorted(alias_to_idx):
            f.write("    %r: %d,\n" % (nm, alias_to_idx[nm]))
        f.write("}\n\nSCRIPT_RANGES = (\n")
        for rs in range_sets:
            f.write("    %r,\n" % (rs,))
        f.write(")\n")
    print("wrote %s: %d scripts (%d with ranges), %d aliases, %d ranges"
          % (OUT, len(range_sets), n_nonempty, len(alias_to_idx),
             sum(len(rs) for rs in range_sets)))


if __name__ == "__main__":
    sys.exit(main())
