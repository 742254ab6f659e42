"""Thread-safety stress (the reference's -race CI analogue, SURVEY §4
item 5): compiled engines are shared across threads with concurrent
searches; results must match the single-threaded answers and the
module-level caches (corpus cache, artifact caches, lazy scanners) must
tolerate concurrent lazy initialization.
"""

import threading

import numpy as np
import pytest

from coregex_tpu.meta.engine import Engine


PATTERNS = [r"\d+", r"[a-z]+\d[a-z]+", r"foo|bar|baz", r"\bw\w+"]


def _corpus(seed):
    rng = np.random.default_rng(seed)
    return rng.choice(list(b"abc 123 foo bar w9z \n"),
                      size=20_000).astype(np.uint8).tobytes()


def test_shared_engine_concurrent_searches():
    engines = [Engine.compile(p) for p in PATTERNS]
    corpora = [_corpus(s) for s in range(4)]
    want = {(i, j): (e.count(c), e.find_all_index(c))
            for i, e in enumerate(engines)
            for j, c in enumerate(corpora)}

    errors = []

    def worker(tid):
        try:
            for rep in range(5):
                for i, e in enumerate(engines):
                    for j, c in enumerate(corpora):
                        got = (e.count(c), e.find_all_index(c))
                        assert got == want[(i, j)], (tid, i, j)
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:1]


def test_concurrent_lazy_init():
    """Many threads racing the FIRST search on a freshly compiled engine
    (lazy DFA/scanner/backtracker initialization)."""
    for rep in range(3):
        e = Engine.compile(r"(ab|cd)+x?\d{2}")
        data = b"zz abcd12 cdab34 xx ab9 cdx77 " * 50
        want = None
        lock = threading.Lock()
        errors = []

        def worker():
            nonlocal want
            try:
                got = e.find_all_index(data)
                with lock:
                    if want is None:
                        want = got
                    else:
                        assert got == want
            except Exception as ex:  # pragma: no cover
                errors.append(ex)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:1]
