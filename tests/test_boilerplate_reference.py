"""Randomized cross-check of functions/boilerplate.py against a pure-
Python reference implementation: for seeded random multi-line corpora,
the Spark operator's (clean_text, lines_total, lines_removed) must equal
a direct dict-based computation of the same CCNet-style semantics."""

import random

from approximate_query_engine_spark.functions.boilerplate import (
    remove_boilerplate,
)

WORDS = ["alpha", "beta", "gamma", "delta", "nav", "home", "about",
         "subscribe", "copyright", "menu", ""]


def _random_corpus(seed: int, n_docs: int = 40):
    rng = random.Random(seed)
    shared = [
        " ".join(rng.choices(WORDS, k=rng.randint(1, 4))) for _ in range(6)
    ]
    docs = []
    for i in range(n_docs):
        lines = []
        for _ in range(rng.randint(0, 8)):
            if rng.random() < 0.4:
                # shared line, sometimes case/whitespace-mangled (must
                # still match under the lower+trim normalization)
                s = rng.choice(shared)
                if rng.random() < 0.3:
                    s = "  " + s.upper() + " "
                lines.append(s)
            else:
                lines.append(f"unique {i} " + " ".join(
                    rng.choices(WORDS, k=rng.randint(1, 3))))
        docs.append((i, "\n".join(lines)))
    return docs


def _reference(docs, min_docs, min_chars=1):
    freq: dict[str, set[int]] = {}
    for i, text in docs:
        for line in (text or "").split("\n"):
            n = line.strip().lower()
            if len(n) >= min_chars:
                freq.setdefault(n, set()).add(i)
    bp = {n for n, s in freq.items() if len(s) >= min_docs}
    out = {}
    for i, text in docs:
        lines = (text or "").split("\n")
        kept = [l for l in lines if l.strip().lower() not in bp]
        out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_matches_python_reference_on_random_corpora(spark):
    for seed in (3, 11, 27):
        docs = _random_corpus(seed)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        for min_docs in (2, 5):
            got = {
                r.doc_id: (r.clean_text, r.lines_total, r.lines_removed)
                for r in remove_boilerplate(df, min_docs=min_docs).collect()
            }
            want = _reference(docs, min_docs)
            assert got == want, (seed, min_docs)
