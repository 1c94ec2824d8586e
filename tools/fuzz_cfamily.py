"""Extended token-level fuzz of the C-family scanner (r10 tranche).

The in-suite hypothesis gate (tests/test_cfamily_analyzer.py) runs 60
char-level examples per suite run — enough as a regression tripwire,
too small to DISCOVER new grammar corners. This runner generates
token-level programs (keywords, operators, identifiers, literals mixed
with structural punctuation) which reach far deeper into the clause
segmentation / guard / pattern heuristics than uniform characters, and
checks three invariants per language:

1. never raises;
2. every row has the 12-column shape;
3. linearity — no example takes > 5s (backtracking blowup).

Usage: python tools/fuzz_cfamily.py [examples-per-lang (default 3000)]
Failures print the minimal reproducer source; promote each into a
pinned test in tests/test_cfamily_analyzer.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import given, seed, settings, strategies as st

from code_graph_backend_spark.sources.cfamily_analyzer import (
    parse_c_source,
    parse_csharp_source,
    parse_java_source,
)

_KEYWORDS = [
    # shared / Java
    "class", "interface", "enum", "record", "void", "int", "return",
    "new", "static", "final", "public", "case", "default", "switch",
    "when", "yield", "extends", "implements", "throws", "try", "catch",
    # C#
    "struct", "partial", "is", "var", "event", "operator", "implicit",
    "explicit", "delegate", "where", "get", "set", "init", "required",
    # C
    "typedef", "union", "sizeof", "goto", "register",
]
_IDENTS = ["x", "y", "Foo", "bar", "T", "_9", "when", "is", "value"]
_PUNCT = [
    "(", ")", "{", "}", "[", "]", "<", ">", ";", ",", ".", "::", "->",
    "=>", "=", "==", "&&", "||", "?", ":", "...", "@", "#", "*", "&",
    '"s"', "'c'", "0", "1.5f", "$\"a{b}c\"", "\n", "\n    ", " ",
]
_TOKEN = st.sampled_from(_KEYWORDS + _IDENTS + _PUNCT)


def _run(n_examples: int) -> int:
    failures = 0

    @seed(20260816)
    @settings(max_examples=n_examples, deadline=None)
    @given(st.lists(_TOKEN, max_size=120))
    def _case(tokens):
        nonlocal failures
        src = " ".join(tokens)
        for fn, fname in (
            (parse_java_source, "f.java"),
            (parse_csharp_source, "f.cs"),
            (parse_c_source, "f.c"),
        ):
            t0 = time.time()
            try:
                rows = fn(fname, src)
            except Exception as ex:  # invariant 1
                failures += 1
                print(f"RAISE {fname}: {ex!r}\n--- src ---\n{src}\n---")
                raise
            dt = time.time() - t0
            assert dt < 5.0, f"SLOW {fname} {dt:.1f}s\n--- src ---\n{src}\n---"
            for r in rows:  # invariant 2
                assert len(r) == 12, f"SHAPE {fname} {len(r)}\n{src}"

    _case()
    return failures


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    t0 = time.time()
    bad = _run(n)
    print(f"fuzz done: {n} examples x 3 languages in {time.time()-t0:.0f}s, "
          f"{bad} failures")
