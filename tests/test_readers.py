"""Streaming reader tests (MatchReader family, regex.go:1619-1667).

The readers must (a) produce the same result as the buffered APIs,
(b) stream with constant memory (no full-stream buffering), and
(c) stop reading as soon as the leftmost match is decided.
"""

import io

import pytest

from coregex_tpu.meta.engine import Engine


class CountingReader:
    """Byte-stream reader that records how many bytes were read and
    refuses to materialize more than `limit` bytes at once."""

    def __init__(self, data: bytes, limit: int = 1 << 22):
        self._buf = io.BytesIO(data)
        self.read_bytes = 0
        self.max_request = 0
        self.limit = limit

    def read(self, n: int = -1) -> bytes:
        assert n != -1, "streaming path must never read the whole stream"
        assert n <= self.limit
        self.max_request = max(self.max_request, n)
        b = self._buf.read(n)
        self.read_bytes += len(b)
        return b


CASES = [
    (r"\d+", b"abc def 123 xyz 456", (8, 11)),
    (r"^abc", b"abcdef", (0, 3)),
    (r"x$", b"aaax", (3, 4)),
    (r"x$", b"x\nx", (2, 3)),
    (r"\bfoo\b", b"xfoo foo bar", (5, 8)),
    (r"a+", b"bbbb", None),
    (r"(a|b)+c", b"zzabbac yy", (2, 7)),
    (r"", b"abc", (0, 0)),
    (r"\B", b"xx", (1, 1)),
]


@pytest.mark.parametrize("pat,data,want", CASES)
@pytest.mark.parametrize("chunk", [1, 3, 7, 64])
def test_find_reader_matches_buffered(pat, data, want, chunk):
    e = Engine.compile(pat)
    got = e.find_reader_index(CountingReader(data), chunk_size=chunk)
    assert got == want
    assert got == e.find_index(data)


@pytest.mark.parametrize("chunk", [1, 5, 1024])
def test_reader_submatch(chunk):
    e = Engine.compile(r"(\w+)@(\w+)")
    data = b"mail me: alice@example today"
    got = e.find_reader_submatch_index(CountingReader(data),
                                       chunk_size=chunk)
    assert got == [(9, 22), (9, 14), (15, 22)]


def test_reader_early_stop():
    """Reading stops as soon as the leftmost match is decided, long
    before the stream ends."""
    data = b"x" * 100 + b"needle" + b"y" * (1 << 20)
    e = Engine.compile(r"needle")
    r = CountingReader(data)
    assert e.find_reader_index(r, chunk_size=256) == (100, 106)
    assert r.read_bytes <= 512  # a couple of chunks, not the megabyte

    r2 = CountingReader(data)
    assert e.is_match_reader(r2, chunk_size=256)


def test_reader_constant_memory():
    """A multi-megabyte stream is processed in fixed-size chunks only
    (no .read() of the whole stream), and the chunk-boundary carry is
    exact for look-around."""
    tail = b"end!"
    data = (b"word " * 200_000) + tail
    e = Engine.compile(r"end!$")
    r = CountingReader(data, limit=1 << 16)
    got = e.find_reader_index(r, chunk_size=1 << 16)
    assert got == (len(data) - 4, len(data))
    assert r.max_request <= 1 << 16


def test_reader_boundary_looks():
    """Word boundaries and anchors evaluated exactly across chunk
    seams (carried previous byte)."""
    e = Engine.compile(r"\bcat\b")
    data = b"concat cat scatter"
    for chunk in (1, 2, 3):
        got = e.find_reader_index(CountingReader(data), chunk_size=chunk)
        assert got == (7, 10)

    e2 = Engine.compile(r"(?m)^line$")
    data2 = b"x\nline\ny"
    for chunk in (1, 4, 100):
        got = e2.find_reader_index(CountingReader(data2),
                                   chunk_size=chunk)
        assert got == (2, 6)


def test_reader_longest_mode():
    e = Engine.compile(r"a|ab", longest=True)
    got = e.find_reader_index(CountingReader(b"xx ab yy"), chunk_size=2)
    assert got == (3, 5)
