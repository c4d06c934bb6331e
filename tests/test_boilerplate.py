"""Line-level boilerplate removal (functions/boilerplate.py): frequency
counting, threshold flagging, order-preserving reconstruction, and the
no-document-vanishes invariant."""

from pyspark.sql import functions as F

from approximate_query_engine_spark.functions.boilerplate import (
    boilerplate_lines,
    incremental_remove_boilerplate,
    line_doc_frequency,
    merge_line_frequency,
    remove_boilerplate,
    split_lines,
)


def _corpus(spark):
    rows = [
        (1, "COOKIE BANNER\nalpha body one\nunique footer 1"),
        (2, "cookie banner\nbeta body two\nshared promo"),
        (3, "Cookie Banner\ngamma body three\nshared promo"),
        (4, "cookie banner\n\ndelta body four\nshared promo"),
        (5, None),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_split_lines_positions_and_null_safety(spark):
    out = split_lines(_corpus(spark)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.line))
    assert by_doc[1] == [
        (0, "COOKIE BANNER"), (1, "alpha body one"), (2, "unique footer 1"),
    ]
    assert by_doc[4][1] == (1, "")  # interior empty line keeps its slot
    assert by_doc[5] == [(0, "")]  # NULL text = empty document, not dropped
    assert by_doc[6] == [(0, "")]


def test_line_doc_frequency_is_distinct_doc_count(spark):
    df = _corpus(spark).union(
        _corpus(spark).sparkSession.createDataFrame(
            [(7, "shared promo\nshared promo")], ["doc_id", "text"]
        )
    )
    freq = {
        r.nline: r.doc_count for r in line_doc_frequency(df).collect()
    }
    assert freq["cookie banner"] == 4  # case/trim-normalized match
    assert freq["shared promo"] == 4  # doc 7's duplicate line counts once
    assert freq["alpha body one"] == 1
    assert "" not in freq  # blank lines are structure, never boilerplate


def test_remove_boilerplate_keeps_order_and_every_doc(spark):
    out = remove_boilerplate(_corpus(spark), min_docs=3)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}  # no document vanishes
    # banner (4 docs) and promo (3 docs) stripped; bodies/footers kept
    assert rows[1].clean_text == "alpha body one\nunique footer 1"
    assert rows[2].clean_text == "beta body two"
    assert rows[4].clean_text == "\ndelta body four"  # blank line survives
    assert (rows[1].lines_total, rows[1].lines_removed) == (3, 1)
    assert (rows[4].lines_total, rows[4].lines_removed) == (4, 2)
    assert rows[5].clean_text == "" and rows[5].lines_removed == 0


def test_remove_boilerplate_all_lines_removed_yields_empty(spark):
    df = spark.createDataFrame(
        [(i, "same line") for i in range(5)], ["doc_id", "text"]
    )
    out = remove_boilerplate(df, min_docs=5)
    assert out.count() == 5
    r = out.where(F.col("doc_id") == 0).collect()[0]
    assert r.clean_text == "" and r.lines_removed == 1


def test_crlf_corpus_blank_lines_and_cross_ending_banners(spark):
    # CRLF docs split cleanly (no trailing \r in line bytes), blank and
    # tab-only lines stay exempt, and the same banner matches across
    # LF and CRLF documents
    rows = [(i, "BANNER\r\n\r\nbody %d\r\n\t" % i) for i in range(3)]
    rows += [(i, "banner\n\nbody %d" % i) for i in range(3, 6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bp = {r.nline for r in boilerplate_lines(df, min_docs=5).collect()}
    assert bp == {"banner"}  # 6 docs across both endings; blanks exempt
    out = {r.doc_id: r for r in remove_boilerplate(df, min_docs=5).collect()}
    assert out[0].clean_text == "\nbody 0\n\t"  # structure intact
    assert out[0].lines_removed == 1
    assert out[3].clean_text == "\nbody 3"


def test_incremental_equals_batch_restricted_to_new_ids(spark):
    # batches carry disjoint ids; union(batches) = the full corpus, so
    # the incremental clean of batch 2 must equal the batch-form clean
    # of the FULL corpus restricted to batch-2 ids
    full = spark.createDataFrame(
        [(i, "shared banner\nbody %d" % i) for i in range(8)]
        + [(i, "other stuff %d" % i) for i in range(8, 12)],
        ["doc_id", "text"],
    )
    b1 = full.where("doc_id < 6")
    b2 = full.where("doc_id >= 6")
    cleaned1, freq1 = incremental_remove_boilerplate(b1, None, min_docs=7)
    # banner seen in only 6 docs so far: batch 1 keeps it
    assert all(r.lines_removed == 0 for r in cleaned1.collect())
    cleaned2, freq2 = incremental_remove_boilerplate(b2, freq1, min_docs=7)
    want = {
        r.doc_id: (r.clean_text, r.lines_total, r.lines_removed)
        for r in remove_boilerplate(full, min_docs=7).collect()
        if r.doc_id >= 6
    }
    got = {
        r.doc_id: (r.clean_text, r.lines_total, r.lines_removed)
        for r in cleaned2.collect()
    }
    assert got == want
    # the updated table counts the whole corpus
    assert {
        r.nline: r.doc_count for r in freq2.collect()
    }["shared banner"] == 8


def test_merge_line_frequency_is_additive(spark):
    a = spark.createDataFrame([("x", 2), ("y", 1)], ["nline", "doc_count"])
    b = spark.createDataFrame([("x", 3), ("z", 4)], ["nline", "doc_count"])
    got = {r.nline: r.doc_count for r in merge_line_frequency(a, b).collect()}
    assert got == {"x": 5, "y": 1, "z": 4}


def test_threshold_and_min_chars_gates(spark):
    df = _corpus(spark)
    bp = {r.nline for r in boilerplate_lines(df, min_docs=4).collect()}
    assert bp == {"cookie banner"}  # promo at 3 docs stays below 4
    # a high min_chars exempts short lines from flagging
    short = spark.createDataFrame(
        [(i, "ok\nlong shared boilerplate line") for i in range(5)],
        ["doc_id", "text"],
    )
    bp2 = {
        r.nline
        for r in boilerplate_lines(short, min_docs=3, min_chars=5).collect()
    }
    assert bp2 == {"long shared boilerplate line"}


def test_line_frequency_sink_round_trips(spark, tmp_path):
    """write_line_frequency / read_line_frequency persist the merged
    counts, the seen-id set and the build params as one artifact; the
    guard built on the reloaded seen ids enforces the disjoint-batch
    contract across sessions."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from approximate_query_engine_spark.functions.boilerplate import (
        incremental_remove_boilerplate,
        line_doc_frequency,
        read_line_frequency,
        write_line_frequency,
    )

    b1 = spark.createDataFrame(
        [(i, f"Shared Banner\nbody {i}") for i in range(12)],
        "doc_id long, text string",
    )
    freq = line_doc_frequency(b1)
    path = str(tmp_path / "bp_state")
    write_line_frequency(
        freq,
        path,
        seen_ids=b1.select("doc_id").distinct(),
        meta={"min_docs": 10, "min_chars": 1},
    )
    freq2, seen2, meta2 = read_line_frequency(spark, path)
    assert meta2 == {"min_docs": 10, "min_chars": 1}
    assert seen2.count() == 12
    got = {r.nline: r.doc_count for r in freq2.collect()}
    assert got["shared banner"] == 12
    # a disjoint batch cleans against the reloaded state
    b2 = spark.createDataFrame(
        [(100, "Shared Banner\nnew body")], "doc_id long, text string"
    )
    cleaned, merged = incremental_remove_boilerplate(
        b2, freq2, min_docs=10, seen_ids=seen2
    )
    row = cleaned.collect()[0]
    assert row.lines_removed == 1 and row.clean_text == "new body"
    assert {r.nline: r.doc_count for r in merged.collect()}[
        "shared banner"
    ] == 13
    # an overlapping batch raises before any count double-adds
    with _pytest.raises(ValueError, match="double-count"):
        incremental_remove_boilerplate(
            b1.limit(1), freq2, min_docs=10, seen_ids=seen2
        )[0].collect()
    # no seen_ids -> the guard is off (documented contract mode)
    cleaned2, _ = incremental_remove_boilerplate(
        b1.limit(1).select("doc_id", F.col("text")), freq2, min_docs=10
    )
    assert cleaned2.count() == 1


def test_read_line_frequency_sidecar_errors_raise(spark, tmp_path):
    """Round-12 review fix: only a MISSING _seen_ids sidecar (pre-guard
    artifact) maps to None; a corrupt one must raise — a silently
    disabled guard would double-count a re-fed batch and truncate the
    persisted seen-id history."""
    import pytest as _pytest

    from approximate_query_engine_spark.functions.boilerplate import (
        line_doc_frequency,
        read_line_frequency,
        write_line_frequency,
    )

    b = spark.createDataFrame(
        [(1, "a\nb")], "doc_id long, text string"
    )
    path = str(tmp_path / "state")
    write_line_frequency(line_doc_frequency(b), path, meta={})
    # no sidecar written at all -> None (the documented pre-guard case)
    _, seen, _ = read_line_frequency(spark, path)
    assert seen is None
    # a sidecar that EXISTS but is unreadable must raise, not degrade
    import os

    os.makedirs(path + "/_seen_ids", exist_ok=True)
    with open(path + "/_seen_ids/part-corrupt.parquet", "wb") as f:
        f.write(b"not parquet at all")
    with _pytest.raises(Exception):
        freq, seen, _ = read_line_frequency(spark, path)
        # Spark may defer the failure to the first action
        if seen is not None:
            seen.count()
        else:  # pragma: no cover - degrading to None IS the bug
            raise AssertionError("corrupt sidecar degraded to None")
