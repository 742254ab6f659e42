"""Public API (stdlib-compatible surface) — populated as the engine lands."""
from __future__ import annotations


def compile(pattern, **kw):  # noqa: A001 - mirrors Go Compile
    from .meta.engine import Engine
    return Engine.compile(pattern, **kw)


def must_compile(pattern, **kw):
    return compile(pattern, **kw)


def compile_posix(pattern, **kw):
    return compile(pattern, longest=True, **kw)


def quote_meta(s: str) -> str:
    special = "\\.+*?()|[]{}^$"
    return "".join("\\" + c if c in special else c for c in s)


def match(pattern, data) -> bool:
    return compile(pattern).is_match(data)


def match_string(pattern, s: str) -> bool:
    return compile(pattern).is_match(s)


Regex = None  # bound to meta.engine.Engine lazily below


def __getattr__(name):
    if name == "Regex":
        from .meta.engine import Engine
        return Engine
    raise AttributeError(name)
