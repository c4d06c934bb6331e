"""Scalar quantization (functions/quantization.py): fit/encode/decode
round trips, code range, quantized kNN vs exact kNN recall, and the
zero-norm cosine guard."""

import math

from pyspark.sql import functions as F

from approximate_query_engine_spark.functions.quantization import (
    ScalarQuantizer,
    knn_join_quantized,
    knn_join_reranked,
    quantized_cosine_expr,
    recall_at_k,
)
from approximate_query_engine_spark.functions.similarity import knn_join


def _vectors(spark):
    rows = [
        (0, [0.0, 1.0, 2.0]),
        (1, [0.5, 1.0, 0.0]),
        (2, [1.0, 0.0, 4.0]),
        (3, [0.25, 0.5, 3.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_fit_and_code_range(spark):
    df = _vectors(spark)
    q = ScalarQuantizer.fit(df, levels=256)
    assert q.mins == (0.0, 0.0, 0.0)
    assert q.scales[0] == 255.0 / 1.0
    codes = {r.vec_id: r.codes for r in q.encode(df).collect()}
    assert codes[0] == [0, 255, 128]  # min→0, max→255, half rounds up
    assert codes[2] == [255, 0, 255]
    assert all(0 <= c <= 255 for cs in codes.values() for c in cs)


def test_constant_dimension_codes_zero(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 7.0]), (1, [2.0, 7.0])], ["vec_id", "embedding"]
    )
    q = ScalarQuantizer.fit(df)
    assert q.scales[1] == 0.0
    codes = {r.vec_id: r.codes for r in q.encode(df).collect()}
    assert codes[0][1] == 0 and codes[1][1] == 0
    # decode returns the dimension's min for constant dims
    dec = q.encode(df).select(
        q.decode_expr("codes").alias("d")
    ).collect()
    assert all(abs(r.d[1] - 7.0) < 1e-12 for r in dec)


def test_decode_reconstruction_error_bounded(spark):
    df = _vectors(spark)
    q = ScalarQuantizer.fit(df)
    out = q.encode(df).select(
        "embedding", q.decode_expr("codes").alias("dec")
    ).collect()
    for r in out:
        for x, y in zip(r.embedding, r.dec):
            # max error is half a quantization cell
            assert abs(x - y) <= 0.5 * (4.0 / 255.0) + 1e-12


def test_sample_fit_clamps_out_of_range_values(spark):
    # fit bounds on a narrow subset; encode the full data — outliers must
    # saturate at [0, levels-1], never leave the code range
    fit_df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    q = ScalarQuantizer.fit(fit_df)
    wide = spark.createDataFrame(
        [(2, [-5.0, 9.0]), (3, [0.5, 0.5])], ["vec_id", "embedding"]
    )
    codes = {r.vec_id: r.codes for r in q.encode(wide).collect()}
    assert codes[2] == [0, 255]  # clamped, not negative / overflowed
    assert codes[3] == [128, 128]
    # sample_fraction=1.0 reproduces the full fit deterministically
    q2 = ScalarQuantizer.fit(fit_df, sample_fraction=1.0)
    assert q2.mins == q.mins and q2.scales == q.scales


def test_wide_levels_dot_products_do_not_overflow_int32(spark):
    # 16-bit quantization: per-element products reach 65535^2 > 2^31 —
    # the dot must widen to int64 BEFORE multiplying
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    q = ScalarQuantizer.fit(df, levels=65536)
    out = knn_join_quantized(df, df, q, k=1, exclude_self=True).collect()
    # identical direction → cosine exactly... 0-code query vector has
    # zero norm → 0.0; the max-code row sees the 0 row at cosine 0.0 —
    # the point is no wrap/ANSI overflow, and a sane non-negative value
    assert all(r.qcosine >= 0.0 for r in out)
    codes = {r.vec_id: r.codes for r in q.encode(df).collect()}
    assert codes[1] == [65535, 65535]


def test_fit_raises_on_empty_and_all_null(spark):
    import pytest
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    empty = spark.createDataFrame([], schema)
    with pytest.raises(ValueError, match="no vectors"):
        ScalarQuantizer.fit(empty)
    all_null = spark.createDataFrame(
        [(0, [None, 1.0]), (1, [None, 2.0])], schema
    )
    with pytest.raises(ValueError, match="all-NULL"):
        ScalarQuantizer.fit(all_null)


def test_encode_raises_on_dimension_mismatch(spark):
    import pytest

    fit_df = spark.createDataFrame(
        [(0, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    q = ScalarQuantizer.fit(fit_df)
    wrong = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="fit on 2 dims"):
        q.encode(wrong).collect()


def test_recall_ignores_duplicate_pairs(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11)], ["query_id", "neighbor_id"]
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 10)], ["query_id", "neighbor_id"]  # dup pair
    )
    r = recall_at_k(exact, approx).collect()[0]
    assert abs(r.recall - 0.5) < 1e-12  # 1 of 2, not 2/3 or 2/2


def test_clamp_stats_flags_out_of_range_dimensions(spark):
    from approximate_query_engine_spark.functions.quantization import (
        clamp_stats,
    )

    fit_df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    q = ScalarQuantizer.fit(fit_df)
    drifted = spark.createDataFrame(
        [(2, [-5.0, 0.5]), (3, [0.5, 0.5]), (4, [2.0, 0.25]),
         (5, [0.1, 0.9])],
        ["vec_id", "embedding"],
    )
    rows = {r.d: r for r in clamp_stats(drifted, q).collect()}
    assert rows[0].n == 4 and rows[0].clamped == 2  # -5.0 and 2.0
    assert rows[0].clamp_fraction == 0.5
    assert rows[1].clamped == 0  # dim 1 stayed inside the fit
    # in-range data on the fitting set itself never clamps
    clean = {r.d: r.clamped for r in clamp_stats(fit_df, q).collect()}
    assert clean == {0: 0, 1: 0}


def test_codes_sink_round_trips_quantizer_and_codes(spark, tmp_path):
    from approximate_query_engine_spark.functions.quantization import (
        read_quantized_codes,
        write_quantized_codes,
    )

    df = _vectors(spark)
    q = ScalarQuantizer.fit(df)
    path = str(tmp_path / "codes")
    write_quantized_codes(df, q, path)
    codes_df, q2 = read_quantized_codes(spark, path)
    assert q2 == q  # float64 params round-trip exactly through JSON
    on_disk = {r.vec_id: r.codes for r in codes_df.collect()}
    live = {r.vec_id: r.codes for r in q.encode(df).collect()}
    assert on_disk == live
    # the persisted pair drives the kNN path directly
    out = knn_join_quantized(
        df, df, q2, k=2, exclude_self=True, right_encoded=codes_df
    )
    assert out.count() == 4 * 2


def test_zero_norm_cosine_is_zero(spark):
    df = spark.createDataFrame(
        [(0, [0, 0], [1, 2])], ["i", "a", "b"]
    )
    r = df.select(
        quantized_cosine_expr(F.col("a"), F.col("b")).alias("c")
    ).collect()[0]
    assert r.c == 0.0


def test_quantized_knn_high_recall_vs_exact(spark):
    import random

    rng = random.Random(7)
    # 20 well-separated clusters of 6: each row's exact top-5 is its 5
    # cluster-mates, with a wide cosine margin to every other cluster —
    # the regime quantized shortlisting must preserve. (On UNIFORM random
    # vectors adjacent cosines differ by less than the quantization
    # noise, so rank flips there are expected, not a defect.)
    rows = []
    for c in range(20):
        center = [rng.uniform(-1, 1) for _ in range(16)]
        for j in range(6):
            rows.append((
                c * 6 + j,
                [x + rng.uniform(-0.02, 0.02) for x in center],
            ))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = ScalarQuantizer.fit(df)
    exact = knn_join(df, df, k=5, exclude_self=True)
    approx = knn_join_quantized(df, df, q, k=5, exclude_self=True)
    rec = recall_at_k(exact, approx).agg(F.avg("recall")).collect()[0][0]
    # 8-bit codes keep every cluster-mate in the shortlist
    assert rec > 0.98, rec
    # sanity on shape: every query has exactly k ranked neighbors
    per = approx.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per)
    assert not math.isnan(rec)
    # shortlist -> exact float rerank REPRODUCES the exact brute result
    # (ids, ranks AND bit-identical cosines — same fold/division order)
    rer = knn_join_reranked(
        df, df, q, k=5, shortlist_factor=4, exclude_self=True
    )
    e_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in exact.collect()
    }
    r_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in rer.collect()
    }
    assert e_rows == r_rows


def _clustered(spark, nclusters=20, per=6, dim=16, seed=7):
    import random

    rng = random.Random(seed)
    rows = []
    for c in range(nclusters):
        center = [rng.uniform(-1, 1) for _ in range(dim)]
        for j in range(per):
            rows.append((
                c * per + j,
                [x + rng.uniform(-0.02, 0.02) for x in center],
            ))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_ivf_quantized_prunes_and_matches_exact_on_clusters(spark):
    """The round-12 composition (VERDICT r11 #1): codes in the IVF
    assigned table, integer shortlist only inside probed buckets, exact
    rerank. On well-separated clusters with k-means-trained centroids
    the probed buckets contain every true neighbor, so the reranked
    output EQUALS exact brute — while cand_cnt proves only a fraction
    of the corpus was ever scored."""
    from approximate_query_engine_spark.functions.quantization import (
        centroid_codes_from_index,
        ivf_assign_quantized,
        knn_join_ivf_quantized,
    )
    from approximate_query_engine_spark.functions.similarity import IVFIndex

    df = _clustered(spark)
    q = ScalarQuantizer.fit(df)
    idx = IVFIndex.train(df, nlist=8, seed=42)
    cents = centroid_codes_from_index(idx, q)
    assigned = ivf_assign_quantized(df, q, cents)
    out = knn_join_ivf_quantized(
        df,
        df,
        q,
        cents,
        k=5,
        nprobe=2,
        shortlist_factor=4,
        exclude_self=True,
        assigned_codes=assigned,
        with_candidate_count=True,
    )
    rows = out.collect()
    exact = knn_join(df, df, k=5, exclude_self=True)
    rec = recall_at_k(exact, out).agg(F.avg("recall")).collect()[0][0]
    assert rec > 0.98, rec
    # pruning proof: nprobe=2 of nlist=8 buckets — no query scored the
    # whole 120-row corpus
    assert all(r.cand_cnt < 119 for r in rows), max(r.cand_cnt for r in rows)
    # rerank cosine is bit-identical to the exact path's (same fold)
    e_rows = {
        (r.query_id, r.neighbor_id): r.cosine for r in exact.collect()
    }
    for r in rows:
        assert e_rows[(r.query_id, r.neighbor_id)] == r.cosine


def test_ivf_quantized_full_probe_equals_quantized_brute(spark):
    """With nprobe == nlist and an uncut shortlist, the probed-bucket
    union IS the corpus, so the rerank=False ranking must equal
    knn_join_quantized's (the all-pairs broad phase) exactly — the
    structural identity that certifies the bucket decomposition loses
    nothing but the unprobed buckets."""
    import numpy as np

    from approximate_query_engine_spark.functions.quantization import (
        knn_join_ivf_quantized,
    )

    df = _clustered(spark, nclusters=10, per=5)
    q = ScalarQuantizer.fit(df)
    rng = np.random.default_rng(3)
    cents = rng.integers(0, 256, size=(4, 16)).tolist()
    full = knn_join_ivf_quantized(
        df, df, q, cents, k=4, nprobe=4, shortlist_factor=50,
        exclude_self=True, rerank=False,
    )
    brute = knn_join_quantized(df, df, q, k=4, exclude_self=True)
    a = {(r.query_id, r.neighbor_id, r.rank, r.qcosine) for r in full.collect()}
    b = {(r.query_id, r.neighbor_id, r.rank, r.qcosine) for r in brute.collect()}
    assert a == b


def test_encode_py_matches_encode_expr(spark):
    """Driver-side centroid encoding must agree with the executor-side
    expression bit-for-bit (same arithmetic order, rounding, clamp) —
    a trained centroid scored against corpus codes is only meaningful
    when both went through the same map."""
    df = _clustered(spark, nclusters=4, per=4)
    q = ScalarQuantizer.fit(df, sample_fraction=0.5, seed=1)
    vecs = [r.embedding for r in df.collect()]
    spark_codes = [r.codes for r in q.encode(df).orderBy("vec_id").collect()]
    py_codes = [q.encode_py(v) for v in vecs]
    assert spark_codes == py_codes
    # dimension mismatch is loud, matching encode_expr's raise_error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        q.encode_py([0.0])


def test_ivf_assign_pandas_path_equals_literal_path(spark):
    """A realistic inverted file (nlist x dim past the literal-plan
    bound) assigns through the Arrow-batched numpy kernel — which must
    agree with the codegen'd literal path on every row, zero-norm rows
    and exact ties included (both break ties to the lowest cid)."""
    import numpy as np

    from approximate_query_engine_spark.functions.quantization import (
        ivf_assign_quantized,
    )

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(16)])
            for i in range(60)]
    rows.append((60, [0.0] * 16))  # zero-norm row: cosine 0 everywhere
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = ScalarQuantizer.fit(df)
    rng = np.random.default_rng(4)
    cents = rng.integers(0, 256, size=(8, 16)).tolist()
    cents.append(list(cents[0]))  # duplicate centroid: exact tie
    cents.append([0] * 16)  # zero-norm centroid
    lit = ivf_assign_quantized(
        df, q, cents, max_literal_cells=1_000_000
    )
    pnd = ivf_assign_quantized(df, q, cents, max_literal_cells=1)
    a = {r.vec_id: (r.codes, r.centroid_id) for r in lit.collect()}
    b = {r.vec_id: (r.codes, r.centroid_id) for r in pnd.collect()}
    assert a == b
    # the duplicate of centroid 0 (cid 8) never wins a tie against it
    assert all(cid != 8 for _, cid in a.values())


def test_ivf_codes_sink_prunes_and_round_trips(spark, tmp_path):
    """write_ivf_quantized_codes persists the assigned table
    partitionBy('centroid_id') with params + centroids in the sidecar:
    a probe-shaped filter reads FEWER files than a full scan (partition
    pruning at the listing, the 100 TB probe cost model), and kNN over
    the reloaded triple equals kNN over the in-memory assignment."""
    import numpy as np

    from approximate_query_engine_spark.functions.quantization import (
        ivf_assign_quantized,
        knn_join_ivf_quantized,
        read_ivf_quantized_codes,
        write_ivf_quantized_codes,
    )
    from approximate_query_engine_spark.operators.partitioning import (
        scan_metrics,
    )

    df = _clustered(spark, nclusters=12, per=5)
    q = ScalarQuantizer.fit(df)
    rng = np.random.default_rng(9)
    cents = rng.integers(0, 256, size=(6, 16)).tolist()
    path = str(tmp_path / "ivf_codes")
    write_ivf_quantized_codes(df, q, cents, path)
    reloaded, q2, cents2 = read_ivf_quantized_codes(spark, path)
    assert q2.to_dict() == q.to_dict()
    assert cents2 == [[int(x) for x in cc] for cc in cents]
    # pruning: a 2-bucket probe filter lists fewer files than full scan
    present = sorted(
        r.centroid_id
        for r in reloaded.select("centroid_id").distinct().collect()
    )
    assert len(present) >= 3  # data spreads over several buckets
    probe = present[:2]
    full = scan_metrics(reloaded.groupBy().count())
    pruned = scan_metrics(
        reloaded.filter(F.col("centroid_id").isin(probe)).groupBy().count()
    )
    assert 0 < pruned["files_read"] < full["files_read"], (pruned, full)
    # reloaded assigned table drives the SAME kNN as in-memory assignment
    mem = ivf_assign_quantized(df, q, cents)
    out_mem = knn_join_ivf_quantized(
        df, df, q, cents, k=4, nprobe=2, exclude_self=True,
        assigned_codes=mem,
    )
    out_disk = knn_join_ivf_quantized(
        df, df, q2, cents2, k=4, nprobe=2, exclude_self=True,
        assigned_codes=reloaded,
    )
    a = {(r.query_id, r.neighbor_id, r.rank) for r in out_mem.collect()}
    b = {(r.query_id, r.neighbor_id, r.rank) for r in out_disk.collect()}
    assert a == b


def test_ivf_quantized_plan_shape_is_scale_safe(spark):
    """Executed-plan regression pin for the composed path's scale
    contract: no Cartesian product anywhere, the shortlist join is a
    broadcast hash join ON centroid_id (probe side builds, corpus
    streams), and the rerank's corpus-vector join builds the pair set
    (the corpus never sits under a BroadcastExchange or shuffles for
    the rerank)."""
    import numpy as np

    from approximate_query_engine_spark.functions.quantization import (
        ivf_assign_quantized,
        knn_join_ivf_quantized,
    )

    df = _clustered(spark, nclusters=10, per=6)
    q = ScalarQuantizer.fit(df)
    cents = np.random.default_rng(2).integers(0, 256, (8, 16)).tolist()
    asg = ivf_assign_quantized(df, q, cents)
    out = knn_join_ivf_quantized(
        df.where("vec_id < 5"), df, q, cents, k=3, nprobe=2,
        assigned_codes=asg,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastHashJoin [centroid_id" in plan, plan[:2000]
    # the probe ranking's centroid frame broadcasts (nested-loop over
    # an 8-row build side is the intended tiny cross)
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan


def test_encode_py_boundary_rounding_matches_spark(spark):
    """Round-12 review fix: floor(v + 0.5) differs from Spark's
    BigDecimal HALF_UP at boundary doubles (0.49999999999999994 + 0.5
    binary-rounds to 1.0; its shortest decimal form HALF_UPs to 0).
    encode_py must agree with encode_expr bit-for-bit there too."""
    v = 0.49999999999999994
    q = ScalarQuantizer(mins=(0.0,), scales=(1.0,), levels=256)
    df = spark.createDataFrame(
        [(0, [v])], "vec_id long, embedding array<double>"
    )
    spark_code = q.encode(df).collect()[0].codes
    assert q.encode_py([v]) == spark_code == [0]


def test_ivf_semantic_dedup_pairs_and_marking(spark):
    """Round-13 SemDedup surface: planted near-dup copies are found as
    same-bucket pairs with EXACT cosine above the threshold (recall vs
    brute-force all-pairs pinned), natural pairs stay below it, the
    marking form keeps the earliest copy and never drops a row, and
    cand_cnt proves the bucketing pruned the pair space."""
    import random

    from approximate_query_engine_spark.functions.dedup import cosine_expr
    from approximate_query_engine_spark.functions.quantization import (
        ScalarQuantizer,
        centroid_codes_from_index,
        ivf_assign_quantized,
        ivf_semantic_dedup,
        ivf_semantic_dup_pairs,
    )
    from approximate_query_engine_spark.functions.similarity import IVFIndex

    rng = random.Random(29)
    rows = []
    for i in range(80):
        c = i % 8
        center = [2.0 * ((c >> b) & 1) - 1.0 for b in range(3)] + [0.5] * 3
        # noise wide enough that NATURAL same-cluster pairs stay below
        # the 0.999 threshold (they sit ~0.99) — only the planted
        # 0.002-perturbation copies (cosine ~0.999998) clear it, so the
        # truth set is exactly the planted pairs and recall is honest
        rows.append((i, [x + rng.uniform(-0.15, 0.15) for x in center]))
    # planted copies of ids 0..19 with a tiny DIRECTION change
    for i in range(20):
        rows.append(
            (1000 + i, [x * (1.0 + 0.002 * ((j % 2) * 2 - 1))
                        for j, x in enumerate(rows[i][1])])
        )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = ScalarQuantizer.fit(df)
    idx = IVFIndex.train(df, nlist=8, seed=5)
    cents = centroid_codes_from_index(idx, q)
    assigned = ivf_assign_quantized(df, q, cents)
    pairs = ivf_semantic_dup_pairs(
        df, q, cents, threshold=0.999, assigned_codes=assigned,
        with_candidate_count=True,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # brute-force truth: EVERY pair with exact cosine >= threshold
    va = df.selectExpr("vec_id AS ia", "embedding AS ea")
    vb = df.selectExpr("vec_id AS ib", "embedding AS eb")
    truth = {
        (r["ia"], r["ib"])
        for r in va.crossJoin(vb)
        .where("ia < ib")
        .withColumn("cos", cosine_expr("ea", "eb"))
        .where("cos >= 0.999")
        .collect()
    }
    assert all((i, 1000 + i) in truth for i in range(3))  # planted
    # recall vs brute force — same-bucket pruning finds the planted
    # copies (near-identical directions co-assign); pin >= 90%
    assert got <= truth
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))
    # pruning proof: no bucket's candidate count reaches all-pairs
    n = df.count()
    assert all(r["cand_cnt"] < n * (n - 1) / 2 for r in pairs)
    # marking form: larger ids flagged, no row vanishes
    marked = ivf_semantic_dedup(
        df, q, cents, threshold=0.999, assigned_codes=assigned
    )
    assert marked.count() == n
    flagged = {
        r["vec_id"]
        for r in marked.where("is_semantic_duplicate").collect()
    }
    assert flagged == {b for _a, b in got}


def test_engine_semantic_dedup_lifecycle(spark):
    """engine.semantic_dedup rides the registered ANN index: finds the
    planted pair from the persisted assigned table, declines loudly on
    a stale index, pairs form returns the raw pairs."""
    import tempfile

    import pytest as _pytest

    from approximate_query_engine_spark import AQEngine

    rows = [
        (i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(40)
    ]
    rows.append((99, [x * 1.0000001 for x in rows[0][1]]))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("sem_vecs")
    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_sem_"))
    eng.build_ivf_codes("sem_vecs", nlist=4, seed=9)
    pairs = eng.semantic_dedup(
        "sem_vecs", threshold=0.999, return_pairs=True
    ).collect()
    assert (0, 99) in {(r["id_a"], r["id_b"]) for r in pairs}
    marked = eng.semantic_dedup("sem_vecs", threshold=0.999)
    dup = {r["vec_id"] for r in marked.where("is_semantic_duplicate").collect()}
    assert 99 in dup and 0 not in dup
    # staleness declines until maintenance accounts for the change
    eng.catalog.upsert_table_stats("sem_vecs", 999)
    with _pytest.raises(ValueError, match="stale"):
        eng.semantic_dedup("sem_vecs")


def test_semantic_dedup_plan_shape(spark):
    """The pair generation must be an EQUI-join on centroid_id — never
    a cartesian/broadcast-nested-loop over the corpus (the all-pairs
    shape SemDedup exists to avoid). Plan-text evidence, the same check
    class as the contamination gram-join test."""
    from approximate_query_engine_spark.functions.quantization import (
        ScalarQuantizer,
        ivf_assign_quantized,
        ivf_semantic_dup_pairs,
    )

    rows = [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(50)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = ScalarQuantizer.fit(df)
    cents = [[10, 10, 200], [200, 10, 10], [10, 200, 10], [120, 120, 120]]
    assigned = ivf_assign_quantized(df, q, cents)
    pairs = ivf_semantic_dup_pairs(
        df, q, cents, threshold=0.99, assigned_codes=assigned
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the join key is the bucket, so the pair space is bucket-local
    assert "centroid_id" in plan


def test_incremental_semantic_dedup_matches_full_restricted(spark):
    """Round-14 invariant (VERDICT r13 #1): the incremental pair set
    over (existing, batch) EQUALS the full-corpus ivf_semantic_dup_pairs
    over the union restricted to pairs touching a batch id — same
    quantizer (fitted on the EXISTING corpus, the build-time state),
    same centroids, exact cosine verdict. Batch ids both smaller and
    larger than existing ids exercise the id_a < id_b canonicalization;
    the marking form applies corpus-wins + keep-earliest-in-batch."""
    import random

    from approximate_query_engine_spark.functions.quantization import (
        ScalarQuantizer,
        centroid_codes_from_index,
        incremental_semantic_dedup,
        incremental_semantic_dup_pairs,
        ivf_assign_quantized,
        ivf_semantic_dup_pairs,
    )
    from approximate_query_engine_spark.functions.similarity import IVFIndex

    rng = random.Random(37)
    existing = []
    for i in range(60):
        c = i % 6
        center = [2.0 * ((c >> b) & 1) - 1.0 for b in range(3)] + [0.4] * 3
        existing.append(
            (100 + i, [x + rng.uniform(-0.12, 0.12) for x in center])
        )
    # batch: a near-copy of existing id 100 under a SMALLER id (5), two
    # near-copies under larger ids, a near-dup PAIR inside the batch,
    # and novel rows
    batch = [
        (5, [x * 1.000001 for x in existing[0][1]]),
        (1000, [x * (1.0 + 0.001 * ((j % 2) * 2 - 1))
                for j, x in enumerate(existing[1][1])]),
        (1001, [x * 1.000002 for x in existing[2][1]]),
        (1002, [rng.uniform(-1, 1) for _ in range(6)]),
        (1003, None),  # placeholder replaced below
    ]
    batch[4] = (1003, [x * 1.0000015 for x in batch[3][1]])  # in-batch dup
    schema = "vec_id long, embedding array<double>"
    edf = spark.createDataFrame(existing, schema)
    bdf = spark.createDataFrame(batch, schema)
    q = ScalarQuantizer.fit(edf)  # build-time fit: EXISTING only
    idx = IVFIndex.train(edf, nlist=6, seed=3)
    cents = centroid_codes_from_index(idx, q)
    existing_assigned = ivf_assign_quantized(edf, q, cents)
    inc, batch_assigned = incremental_semantic_dup_pairs(
        bdf, existing_assigned, edf, q, cents, threshold=0.999,
        with_candidate_count=True,
    )
    inc_rows = inc.collect()
    got = {(r["id_a"], r["id_b"]) for r in inc_rows}
    # full replay over the union with the SAME quantizer + centroids
    union = edf.unionByName(bdf)
    full = ivf_semantic_dup_pairs(
        union, q, cents, threshold=0.999,
        assigned_codes=ivf_assign_quantized(union, q, cents),
    ).collect()
    new_ids = {i for i, _v in batch}
    want = {
        (r["id_a"], r["id_b"])
        for r in full
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    }
    assert got == want, (got, want)
    # the planted pairs are all found, including the smaller-id batch row
    assert (5, 100) in got and (1002, 1003) in got
    assert (101, 1000) in got and (102, 1001) in got
    # cosines match the full replay exactly (same pinned expression)
    full_cos = {
        (r["id_a"], r["id_b"]): r["cosine"] for r in full
    }
    for r in inc_rows:
        assert r["cosine"] == full_cos[(r["id_a"], r["id_b"])]
    # pruning proof: candidate counts are batch-bucket-sized, never the
    # union's all-pairs
    n = 65
    assert all(r["cand_cnt"] < n * (n - 1) / 2 for r in inc_rows)
    # batch_assigned matches what full assignment gives those ids
    ba = {r["vec_id"]: r["centroid_id"] for r in batch_assigned.collect()}
    fa = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign_quantized(bdf, q, cents).collect()
    }
    assert ba == fa and set(ba) == new_ids
    # marking form: corpus-wins (id 5 flagged despite being smaller),
    # keep-earliest within the batch (1003 flagged, 1002 kept)
    marked, _ = incremental_semantic_dedup(
        bdf, existing_assigned, edf, q, cents, threshold=0.999
    )
    flags = {
        r["vec_id"]: r["is_semantic_duplicate"] for r in marked.collect()
    }
    assert flags == {
        5: True, 1000: True, 1001: True, 1002: False, 1003: True
    }, flags


def test_engine_semantic_dedup_update_lifecycle(spark):
    """engine.semantic_dedup_update: assigns the batch into the
    REGISTERED index's buckets, returns the incremental pairs/marks,
    appends the codes partition-wise, and accounts for the batch
    (built_row_count, catalog stats). The disjoint-batch guard refuses
    re-fed and NULL ids BEFORE anything is appended; a later knn over
    the updated index sees the batch's vectors."""
    import tempfile

    import pytest as _pytest

    from approximate_query_engine_spark import AQEngine

    rows = [
        (i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(40)
    ]
    schema = "vec_id long, embedding array<double>"
    spark.createDataFrame(rows, schema).createOrReplaceTempView("semu_vecs")
    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_semu_"))
    eng.build_ivf_codes("semu_vecs", nlist=4, seed=9)
    batch_rows = [
        (200, [x * 1.0000001 for x in rows[0][1]]),  # dup of id 0
        (201, [9.0, -9.0, 9.0]),                     # novel direction
        (202, [x * 1.0000002 for x in rows[7][1]]),  # dup of id 7
    ]
    batch = spark.createDataFrame(batch_rows, schema)
    pairs, entry = eng.semantic_dedup_update(
        "semu_vecs", batch, threshold=0.999, return_pairs=True
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 200) in got and (7, 202) in got
    assert not any(a == 201 or b == 201 for a, b in got)
    assert entry["built_row_count"] == 43
    # codes were appended into the SAME versioned path, partition-wise
    assert spark.read.parquet(entry["path"]).count() == 43
    # base-table contract: append the batch to the table too
    spark.createDataFrame(rows + batch_rows, schema).createOrReplaceTempView(
        "semu_vecs"
    )
    # the updated index serves knn over the batch's vectors (wide
    # shortlist: the grid corpus puts several rows on 201's CODE-space
    # direction, and code ties break by id before the float rerank)
    nbr = eng.knn(
        "semu_vecs", batch.where("vec_id = 201"), k=2, nprobe=4,
        shortlist_factor=8,
    ).collect()
    assert nbr and nbr[0]["neighbor_id"] == 201, nbr
    assert nbr[0]["cosine"] == 1.0
    # re-feeding any already-indexed id is refused, nothing appended
    with _pytest.raises(ValueError, match="re-feeds vector ids"):
        eng.semantic_dedup_update("semu_vecs", batch)
    assert spark.read.parquet(entry["path"]).count() == 43
    # NULL-id batches are refused outright
    nb = spark.createDataFrame([(None, [1.0, 1.0, 1.0])], schema)
    with _pytest.raises(ValueError, match="NULL vector ids"):
        eng.semantic_dedup_update("semu_vecs", nb)
    # marked form on a second disjoint batch: dup flagged, novel kept
    b2 = spark.createDataFrame(
        [(300, [x * 1.0000003 for x in rows[1][1]]), (301, [-7.0, 3.0, -5.0])],
        schema,
    )
    marked, entry2 = eng.semantic_dedup_update(
        "semu_vecs", b2, threshold=0.999
    )
    flags = {r["vec_id"]: r["is_semantic_duplicate"] for r in marked.collect()}
    assert flags == {300: True, 301: False}
    assert entry2["built_row_count"] == 45
    spark.createDataFrame(
        rows + batch_rows + [(300, None), (301, None)], schema
    )  # (doc only: table append is the caller's job)
    # a REAL mutation (not the pending batch) still declines stale
    eng.catalog.upsert_table_stats("semu_vecs", 999)
    with _pytest.raises(ValueError, match="stale"):
        eng.semantic_dedup_update(
            "semu_vecs",
            spark.createDataFrame([(400, [1.0, 2.0, 3.0])], schema),
        )


def test_build_ivf_codes_with_given_centroids(spark):
    """Round 14: bring-your-own coarse geometry — build_ivf_codes with
    explicit float centroids skips k-means, records nlist from the
    list, and assigns exactly as the functional path with the encoded
    centroid codes. decode_py(codes) re-encodes to the same codes (the
    cell-center round-trip q120's oracle relies on)."""
    import tempfile

    import numpy as np

    from approximate_query_engine_spark import AQEngine
    from approximate_query_engine_spark.functions.quantization import (
        ScalarQuantizer,
        ivf_assign_quantized,
        read_ivf_quantized_codes,
    )

    # no constant dimension: a 0-scale dim decodes to its min and
    # re-encodes to 0, so only varying dims round-trip arbitrary codes
    rows = [
        (i, [float((i * 13) % 7) - 3.0, float((i * 5) % 11) / 2.0,
             float(i % 4)])
        for i in range(30)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("byo_vecs")
    q = ScalarQuantizer.fit(spark.table("byo_vecs"))
    seeded = np.random.default_rng(7).integers(0, 256, (4, 3)).tolist()
    floats = [q.decode_py(c) for c in seeded]
    assert [q.encode_py(f) for f in floats] == [
        [int(x) for x in c] for c in seeded
    ]
    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_byo_"))
    entry = eng.build_ivf_codes("byo_vecs", centroids=floats)
    assert entry["kind"] == "ivf" and entry["nlist"] == 4
    assigned, quant, cents = read_ivf_quantized_codes(spark, entry["path"])
    assert cents == [[int(x) for x in c] for c in seeded]
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    want = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign_quantized(
            spark.table("byo_vecs"), q, seeded
        ).collect()
    }
    assert got == want


def test_bucket_skew_footer_probe_equals_scan_form(spark, tmp_path):
    """Round 14 (VERDICT r13 #6): the metadata-only skew probe (parquet
    footer row counts per centroid_id directory, no Spark job) must be
    value-identical to the scan form — including after partition-wise
    appends land extra part files — and raise on a non-partitioned
    path so maintenance falls back to the scan."""
    import pytest

    from approximate_query_engine_spark.functions.quantization import (
        ScalarQuantizer,
        ivf_assign_quantized,
        ivf_bucket_skew,
        ivf_bucket_skew_from_footers,
    )

    rows = [(i, [float(i % 9), float((i * 3) % 7), float(i % 4)])
            for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = ScalarQuantizer.fit(df)
    import numpy as np

    cents = np.random.default_rng(3).integers(0, 256, (5, 3)).tolist()
    path = str(tmp_path / "skewcodes")
    asg = ivf_assign_quantized(df, q, cents)
    asg.write.partitionBy("centroid_id").parquet(path)
    scan = ivf_bucket_skew(spark.read.parquet(path), nlist=5)
    foot = ivf_bucket_skew_from_footers(spark, path, nlist=5)
    assert foot == scan, (foot, scan)
    # append more files into the buckets (the maintenance/update shape)
    extra = [(200 + i, [8.0, 6.0, 3.0]) for i in range(40)]
    ivf_assign_quantized(
        spark.createDataFrame(extra, "vec_id long, embedding array<double>"),
        q, cents,
    ).write.mode("append").partitionBy("centroid_id").parquet(path)
    scan2 = ivf_bucket_skew(spark.read.parquet(path), nlist=5)
    foot2 = ivf_bucket_skew_from_footers(spark, path, nlist=5)
    assert foot2 == scan2, (foot2, scan2)
    # the 40 identical appended vectors all landed in one bucket
    assert foot2["mean"] == scan["mean"] + 40 / 5.0
    # empty-bucket weighting: nlist > populated keeps the mean honest
    assert ivf_bucket_skew_from_footers(spark, path, nlist=10)["buckets"] == 10
    # a non-partitioned table raises -> maintenance falls back to scan
    flat = str(tmp_path / "flatcodes")
    df.write.parquet(flat)
    with pytest.raises(ValueError, match="bucket directories"):
        ivf_bucket_skew_from_footers(spark, flat)


def test_semantic_dedup_multi_probe_bounds_voronoi_miss(spark):
    """Round 14 (VERDICT r13 #6, optional knob): two near-identical
    vectors straddling a Voronoi boundary argmax into DIFFERENT buckets
    and the single-assignment pair generation never compares them;
    assign_probes=2 puts both in both top-2 buckets and finds the pair.
    Multi-assign rank 1 equals the stored argmax (both execution paths
    value-identical); the per-bucket candidate count is refused under
    multi-probe (a pair sharing two buckets has no owning bucket)."""
    import pytest

    from approximate_query_engine_spark.functions.quantization import (
        ScalarQuantizer,
        ivf_assign_quantized,
        ivf_multi_assign_quantized,
        ivf_semantic_dup_pairs,
    )

    rows = [
        (0, [0.0, 0.0]),   # range corner (zero-norm: cosine defined 0)
        (1, [1.0, 0.9]),   # boundary pair: cos(v1, v2) = 0.99448...
        (2, [0.9, 1.0]),
        (3, [1.0, 0.0]),   # bucket-0 interior
        (4, [0.0, 1.0]),   # bucket-1 interior
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = ScalarQuantizer.fit(df)
    cents = [[255, 0], [0, 255]]
    a1 = {
        r.vec_id: r.centroid_id
        for r in ivf_assign_quantized(df, q, cents).collect()
    }
    assert a1[1] != a1[2]  # the boundary split
    p1 = {
        (r.id_a, r.id_b)
        for r in ivf_semantic_dup_pairs(df, q, cents, threshold=0.99).collect()
    }
    assert (1, 2) not in p1 and p1 == set()  # single-probe miss
    p2 = {
        (r.id_a, r.id_b)
        for r in ivf_semantic_dup_pairs(
            df, q, cents, threshold=0.99, assign_probes=2
        ).collect()
    }
    assert p2 == {(1, 2)}
    # rank 1 of the multi-assignment IS the stored argmax
    m = ivf_multi_assign_quantized(df, q, cents, probes=2)
    r1 = {
        r.vec_id: r.centroid_id
        for r in m.where("assign_rank = 1").collect()
    }
    assert r1 == a1
    # the Arrow kernel path is value-identical to the literal path
    mp = ivf_multi_assign_quantized(
        df, q, cents, probes=2, max_literal_cells=1
    )
    assert sorted(
        (r.vec_id, r.centroid_id, r.assign_rank) for r in mp.collect()
    ) == sorted(
        (r.vec_id, r.centroid_id, r.assign_rank) for r in m.collect()
    )
    with pytest.raises(ValueError, match="no per-bucket"):
        ivf_semantic_dup_pairs(
            df, q, cents, assign_probes=2, with_candidate_count=True
        )


def test_incremental_semantic_multi_probe(spark):
    """Round 14: assign_probes on the INCREMENTAL form widens the BATCH
    side to its top-P buckets — a boundary batch row whose argmax bucket
    differs from its existing near-dup's is missed at probes=1 and found
    at probes=2; the appendable rank-1 codes are identical either way,
    and the probes=2 pair set is a superset of probes=1's."""
    import pytest

    from approximate_query_engine_spark.functions.quantization import (
        ScalarQuantizer,
        incremental_semantic_dup_pairs,
        ivf_assign_quantized,
    )

    schema = "vec_id long, embedding array<double>"
    existing = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.9]), (2, [1.0, 0.0]),
         (3, [0.0, 1.0])],
        schema,
    )
    q = ScalarQuantizer.fit(existing)
    cents = [[255, 0], [0, 255]]
    asg = ivf_assign_quantized(existing, q, cents)
    batch = spark.createDataFrame([(100, [0.9, 1.0])], schema)
    p1, ba1 = incremental_semantic_dup_pairs(
        batch, asg, existing, q, cents, threshold=0.99
    )
    assert {(r.id_a, r.id_b) for r in p1.collect()} == set()  # miss
    p2, ba2 = incremental_semantic_dup_pairs(
        batch, asg, existing, q, cents, threshold=0.99, assign_probes=2
    )
    assert {(r.id_a, r.id_b) for r in p2.collect()} == {(1, 100)}
    # appended codes are the rank-1 assignment in BOTH forms
    rows1 = [(r.vec_id, r.codes, r.centroid_id) for r in ba1.collect()]
    rows2 = [(r.vec_id, r.codes, r.centroid_id) for r in ba2.collect()]
    assert rows1 == rows2 and len(rows1) == 1
    with pytest.raises(ValueError, match="no per-bucket"):
        incremental_semantic_dup_pairs(
            batch, asg, existing, q, cents,
            assign_probes=2, with_candidate_count=True,
        )


def test_incremental_semantic_plan_shape(spark):
    """The incremental pair generation must broadcast the BATCH side
    into the bucket equi-join (the corpus-sized assigned table streams)
    and contain no cartesian anywhere — the scale shape SCALING.md
    claims. Plan-text evidence, the full form's test one batch over."""
    import numpy as np

    from approximate_query_engine_spark.functions.quantization import (
        ScalarQuantizer,
        incremental_semantic_dup_pairs,
        ivf_assign_quantized,
    )

    rows = [(i, [float(i % 9), float((i * 3) % 7), float(i % 4)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = ScalarQuantizer.fit(df)
    cents = np.random.default_rng(5).integers(0, 256, (6, 3)).tolist()
    asg = ivf_assign_quantized(df, q, cents)
    batch = spark.createDataFrame(
        [(1000 + i, [1.0, 2.0, 3.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    pairs, _ = incremental_semantic_dup_pairs(batch, asg, df, q, cents)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastHashJoin [centroid_id" in plan, plan[:2000]


def test_semantic_update_refuses_in_batch_duplicate_ids(spark):
    """Round-14 review: a batch repeating a vector id WITHIN itself
    would append two code rows under one id — double-served by every
    probe — so the guard refuses before anything is appended."""
    import tempfile

    import pytest

    from approximate_query_engine_spark import AQEngine

    schema = "vec_id long, embedding array<double>"
    rows = [(i, [float(i % 4), float(i % 3), 1.0]) for i in range(30)]
    spark.createDataFrame(rows, schema).createOrReplaceTempView("dupb_vecs")
    eng = AQEngine(spark, workdir=tempfile.mkdtemp(prefix="aqe_dupb_"))
    entry = eng.build_ivf_codes("dupb_vecs", nlist=4, seed=1)
    dup_batch = spark.createDataFrame(
        [(100, [1.0, 2.0, 3.0]), (100, [1.0, 2.0, 3.0]),
         (101, [2.0, 1.0, 0.5])],
        schema,
    )
    with pytest.raises(ValueError, match="duplicate vector ids"):
        eng.semantic_dedup_update("dupb_vecs", dup_batch)
    assert spark.read.parquet(entry["path"]).count() == 30  # untouched
