"""Randomized cross-check of functions/quantization.py against a pure-
Python reference: seeded random vector sets, full fit — codes, decode
bounds and quantized-cosine ranking must equal a direct float64
computation of the same formulas."""

import math
import random

from approximate_query_engine_spark.functions.quantization import (
    ScalarQuantizer,
    knn_join_quantized,
)


def _ref_fit(vecs, levels=256):
    dims = len(vecs[0])
    mins = [min(v[d] for v in vecs) for d in range(dims)]
    maxs = [max(v[d] for v in vecs) for d in range(dims)]
    scales = [
        (levels - 1) / (mx - mn) if mx > mn else 0.0
        for mn, mx in zip(mins, maxs)
    ]
    return mins, scales


def _ref_encode(v, mins, scales, levels=256):
    out = []
    for x, mn, sc in zip(v, mins, scales):
        # same order: (x - min) * scale, round-half-up, clamp
        c = math.floor((x - mn) * sc + 0.5)
        out.append(max(0, min(levels - 1, c)))
    return out


def test_codes_match_python_reference(spark):
    for seed in (5, 19):
        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-3, 3) for _ in range(12)]) for i in range(60)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        q = ScalarQuantizer.fit(df)
        mins, scales = _ref_fit([v for _, v in rows])
        assert all(abs(a - b) < 1e-12 for a, b in zip(q.mins, mins))
        assert all(abs(a - b) < 1e-12 for a, b in zip(q.scales, scales))
        got = {r.vec_id: r.codes for r in q.encode(df).collect()}
        for i, v in rows:
            assert got[i] == _ref_encode(v, mins, scales), (seed, i)


def test_quantized_ranking_matches_python_reference(spark):
    rng = random.Random(23)
    rows = [(i, [rng.uniform(0, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = ScalarQuantizer.fit(df)
    mins, scales = _ref_fit([v for _, v in rows])
    codes = {i: _ref_encode(v, mins, scales) for i, v in rows}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return (dot / na) / nb if na > 0 and nb > 0 else 0.0

    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in knn_join_quantized(
            df.where("vec_id < 10"), df, q, k=4, exclude_self=True
        ).collect()
    }
    for qid in range(10):
        ranked = sorted(
            (j for j in codes if j != qid),
            key=lambda j: (-cos(codes[qid], codes[j]), j),
        )[:4]
        for rank, j in enumerate(ranked, start=1):
            assert got[(qid, rank)] == j, (qid, rank)
