"""Pipeline-operator tests: text analysis, dedup family, similarity search,
multimodal plumbing. Runs on sf0.001 documents/embeddings plus constructed
fixtures with known duplicates."""

import math

import pytest
from pyspark.sql import functions as F

from approximate_query_engine_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(engine):
    return engine.spark.table("documents")


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Docs with planted exact and near duplicates."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup of 1
        (4, "completely different text about spark query engines and samples"),
        (5, "completely different text about spark query engines and samples!"),  # near dup of 4
        (6, "unrelated short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---- text ----
def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  one ",)], "text string")
    out = [r[0] for r in df.select(text.token_count_expr("text")).collect()]
    assert out == [3, 0, 1]


def test_bpe_ish_count_exceeds_for_long_words(spark):
    df = spark.createDataFrame([("short but supercalifragilistic",)], "text string")
    n, b = df.select(
        text.token_count_expr("text"), text.bpe_ish_token_count_expr("text")
    ).collect()[0]
    assert b > n  # long word costs ~len/4 subword tokens


def test_quality_score_ranges(docs):
    rows = text.with_quality(docs).select("quality_score").collect()
    assert all(0.0 <= r[0] <= 1.0 for r in rows)


def test_quality_prefers_clean_text(spark):
    df = spark.createDataFrame(
        [
            (1, "the data pipeline processed a batch of records in the cluster today"),
            (2, "!!! ??? ... ;;; ::: ,,, (((" ),
        ],
        "id long, text string",
    )
    scores = {r["id"]: r["quality_score"] for r in text.with_quality(df).collect()}
    assert scores[1] > scores[2]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and the dog is outside"),
            (2, "der Hund ist nicht in der Stadt und das ist gut"),
            (3, "le chat est dans la maison et les chiens sont là"),
            (4, "el perro es grande y los gatos son pequeños"),
            (5, "数据库查询引擎处理大规模数据"),
            (6, "zzz qqq xxx"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang_pred"] for r in text.with_lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh", 6: "und"}


def test_fingerprint_normalization_collides(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "different")],
        "id long, text string",
    )
    fp = {r["id"]: r["fingerprint"] for r in text.with_fingerprints(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_rolling_fingerprints_overlap_for_containment(spark):
    a = "the quick brown fox jumps over the lazy dog " * 3
    df = spark.createDataFrame(
        [(1, a), (2, a + " extra tail content here"), (3, "zzz " * 30)],
        "id long, text string",
    )
    rows = {r["id"]: set(r["rolling_fp"]) for r in text.with_fingerprints(df).collect()}
    overlap_near = len(rows[1] & rows[2]) / len(rows[1] | rows[2])
    overlap_far = len(rows[1] & rows[3]) / len(rows[1] | rows[3])
    assert overlap_near > overlap_far


# ---- dedup ----
def test_exact_dedup(dup_docs):
    kept = dedup.dedup_exact(dup_docs, ["text"], "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4, 5, 6]  # doc 2 dropped (exact dup of 1)
    groups = dedup.exact_duplicate_groups(dup_docs, ["text"], "doc_id").collect()
    assert len(groups) == 1 and groups[0]["n_copies"] == 2


def test_minhash_jaccard_estimate_close_to_exact(dup_docs):
    sig = dedup.with_minhash(dup_docs, num_hashes=128)
    a = sig.filter("doc_id = 1").select("shingles", "minhash").collect()[0]
    b = sig.filter("doc_id = 3").select("shingles", "minhash").collect()[0]
    inter = len(set(a["shingles"]) & set(b["shingles"]))
    union = len(set(a["shingles"]) | set(b["shingles"]))
    exact_j = inter / union
    est_j = sum(x == y for x, y in zip(a["minhash"], b["minhash"])) / 128
    assert abs(est_j - exact_j) < 0.2


def test_minhash_near_duplicates_finds_planted(dup_docs):
    pairs = dedup.minhash_near_duplicates(
        dup_docs, threshold=0.6, num_hashes=64, bands=16
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found  # exact dup always found
    assert (1, 3) in found or (4, 5) in found  # near dups
    assert all(r["jaccard"] >= 0.6 for r in pairs)


def test_dedup_minhash_keeps_canonical(dup_docs):
    kept = dedup.dedup_minhash(dup_docs, threshold=0.6, num_hashes=64, bands=16)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 1 in ids and 2 not in ids  # smaller id survives
    assert 6 in ids


def test_simhash_near_duplicates(dup_docs):
    pairs = dedup.simhash_near_duplicates(dup_docs, max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found
    hams = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert hams[(1, 2)] == 0  # identical text -> identical simhash


def test_ngram_jaccard_pairs(dup_docs):
    pairs = dedup.ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert found[(1, 2)] == 1.0
    assert (1, 3) in found


def test_embedding_near_duplicates(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    v1 = rng.standard_normal(16)
    v2 = v1 + rng.standard_normal(16) * 0.01  # near dup
    v3 = rng.standard_normal(16)
    df = spark.createDataFrame(
        [(1, v1.tolist()), (2, v2.tolist()), (3, v3.tolist())],
        "vec_id long, embedding array<double>",
    )
    pairs = dedup.embedding_near_duplicates(
        df, dim=16, threshold=0.99, nbits=8
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert found == {(1, 2)}


# ---- similarity ----
def test_brute_force_topk_self_is_top(engine):
    emb = engine.spark.table("embeddings")
    qv = emb.filter("vec_id = 7").select("embedding").collect()[0][0]
    top = similarity.topk_cosine_brute_force(emb, qv, k=5).collect()
    assert top[0]["vec_id"] == 7
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
    sims = [r["cosine"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall_vs_brute_force(engine):
    emb = engine.spark.table("embeddings")
    qv = emb.filter("vec_id = 3").select("embedding").collect()[0][0]
    exact = [r["vec_id"] for r in similarity.topk_cosine_brute_force(emb, qv, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in similarity.topk_cosine_lsh(
            emb, qv, k=10, dim=64, nbits=10, max_hamming=3
        ).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert approx[0] == 3  # self always survives LSH (identical signature)
    assert recall >= 0.3  # loose: tiny index, few buckets


def test_ivf_topk(engine):
    emb = engine.spark.table("embeddings")
    idx = similarity.IVFIndex.train(emb, nlist=8, sample_rows=500, seed=1)
    assigned = idx.assign(emb)
    n_assigned = assigned.count()
    assert n_assigned == emb.count()
    qv = emb.filter("vec_id = 11").select("embedding").collect()[0][0]
    top = idx.topk(assigned, qv, k=5, nprobe=3).collect()
    assert top and top[0]["vec_id"] == 11


# ---- multimodal ----
def test_media_decode_fake_roundtrip(spark):
    df = multimodal.make_fake_media_df(spark, 30)
    out = multimodal.decode_media(df, fake=True)
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert r["decoded_width"] == r["width"]
        assert r["decoded_height"] == r["height"]
        assert not math.isnan(r["payload_mean"])


def test_media_decode_stub_raises_without_fake(spark):
    df = multimodal.make_fake_media_df(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|decoding"):
        multimodal.decode_media(df, fake=False).collect()


def test_feature_extract_shape(spark):
    df = multimodal.make_fake_media_df(spark, 10)
    feats = multimodal.extract_features(df, dim=8, fake=True).collect()
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic per media_id
    feats2 = multimodal.extract_features(df, dim=8, fake=True).collect()
    assert feats[0]["feature"] == feats2[0]["feature"]


def test_frame_sample_plan(spark):
    df = multimodal.make_fake_media_df(spark, 9)
    frames = multimodal.frame_sample_plan(df, every_ms=1000)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_ts_ms"}
    one = pdf[pdf.media_id == 5]
    dur = df.filter("media_id = 5").collect()[0]["duration_ms"]
    assert len(one) == dur // 1000 + 1


def test_media_stats_prunes_binary(spark):
    df = multimodal.make_fake_media_df(spark, 12)
    stats = {r["kind"]: r["n"] for r in multimodal.media_stats(df).collect()}
    assert stats == {"image": 4, "audio": 4, "video": 4}


# ---- real codecs (BMP / PCM16 WAV — no external libs needed) ----
def test_bmp_roundtrip_local():
    import numpy as np

    blob = multimodal.encode_bmp(17, 9, seed=3)  # odd width → row padding
    w, h, mean = multimodal.decode_bmp(blob)
    assert (w, h) == (17, 9)
    # mean of uniform bytes ≈ 127.5; exact value must be reproducible
    w2, h2, mean2 = multimodal.decode_bmp(multimodal.encode_bmp(17, 9, seed=3))
    assert mean == mean2 and 100 < mean < 155
    # padding must NOT leak into the mean: all-zero pad vs pixel data
    assert not np.isnan(mean)


def test_wav_roundtrip_local():
    blob = multimodal.encode_wav_pcm16(3200, 16_000, channels=2, seed=7)
    channels, rate, dur_ms, amp = multimodal.decode_wav(blob)
    assert (channels, rate, dur_ms) == (2, 16_000, 200)
    assert 10_000 < amp < 22_000  # mean |x| of uniform int16 ≈ 16384


def test_media_decode_real_blobs_no_fake(spark):
    """decode_media(fake=False) does REAL work on BMP/WAV blobs."""
    df = multimodal.make_real_media_df(spark, 10)
    rows = {r["media_id"]: r for r in multimodal.decode_media(df, fake=False).collect()}
    assert len(rows) == 10
    for mid, r in rows.items():
        if r["kind"] == "image":
            assert r["decoded_kind"] == 1
            assert r["decoded_width"] == r["width"]
            assert r["decoded_height"] == r["height"]
        else:
            assert r["decoded_kind"] == 2
            assert r["decoded_width"] == 16_000  # sample_rate slot
        assert not math.isnan(r["payload_mean"])


def test_wav_data_chunk_before_fmt():
    """RIFF does not order chunks: a [data, fmt ] layout must decode, not
    raise 'missing fmt /data chunk' (regression: the walk interpreted data
    inline and skipped it when fmt hadn't been seen yet)."""
    import struct

    blob = multimodal.encode_wav_pcm16(1600, 16_000, channels=1, seed=5)
    # re-order: split the encoder's [fmt, data] chunks and swap them
    fmt_off = blob.index(b"fmt ")
    fmt_len = struct.unpack_from("<I", blob, fmt_off + 4)[0]
    fmt_chunk = blob[fmt_off : fmt_off + 8 + fmt_len]
    data_off = blob.index(b"data")
    data_len = struct.unpack_from("<I", blob, data_off + 4)[0]
    data_chunk = blob[data_off : data_off + 8 + data_len]
    swapped = blob[:12] + data_chunk + fmt_chunk
    channels, rate, dur_ms, amp = multimodal.decode_wav(swapped)
    assert (channels, rate, dur_ms) == (1, 16_000, 100)
    ref = multimodal.decode_wav(blob)
    assert amp == ref[3]


def test_term_doc_frequency(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat, the cat!"), (2, "THE dog"), (3, "a cat")],
        ["doc_id", "text"],
    )
    from approximate_query_engine_spark.functions.text import term_doc_frequency

    df = {r["term"]: r["df"] for r in term_doc_frequency(docs).collect()}
    # df counts DOCUMENTS, not occurrences; case-folded; punctuation splits
    assert df["the"] == 2 and df["cat"] == 2 and df["dog"] == 1 and df["a"] == 1
    df2 = {
        r["term"]: r["df"]
        for r in term_doc_frequency(docs, min_df=2).collect()
    }
    assert set(df2) == {"the", "cat"}


def test_tf_idf_ranking(spark):
    """Rarer terms score higher at equal tf; tf scales linearly."""
    docs = spark.createDataFrame(
        [(1, "common rare"), (2, "common"), (3, "common common")],
        ["doc_id", "text"],
    )
    from approximate_query_engine_spark.functions.text import tf_idf

    rows = {(r["doc_id"], r["term"]): r for r in tf_idf(docs).collect()}
    assert rows[(1, "rare")]["tfidf"] > rows[(1, "common")]["tfidf"]
    assert rows[(3, "common")]["tf"] == 2
    assert rows[(3, "common")]["tfidf"] == 2 * rows[(2, "common")]["tfidf"]


# ---------------------------------------------------------------------------
# repetition metrics


def test_repetition_counts_hand_computed(spark):
    from approximate_query_engine_spark.functions.text import with_repetition

    df = spark.createDataFrame(
        [
            # "a b a b a": top token 'a' x3, top bigram 'a b' x2 (of 4), 2 distinct
            (1, "a b a b a"),
            (2, "one two three four five"),  # no repetition at all
            (3, "x"),  # single token: no bigrams
            (4, ""),  # empty text: zero tokens
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in with_repetition(df).collect()}
    assert rows[1]["r_top_token_count"] == 3
    assert rows[1]["r_top_bigram_count"] == 2
    assert rows[1]["r_n_distinct_tokens"] == 2
    # top_token 3/5 > 0.30 -> reject
    assert rows[1]["repetition_reject"] is True
    assert rows[2]["r_top_token_count"] == 1
    assert rows[2]["r_top_bigram_count"] == 1
    assert rows[2]["repetition_reject"] is False
    assert rows[3]["r_top_bigram_count"] == 0
    assert rows[4]["r_n_tokens"] == 0
    assert rows[4]["r_top_token_count"] == 0


def test_repetition_boundary_is_strict(spark):
    from approximate_query_engine_spark.functions.text import (
        repetition_reject_expr,
    )
    from pyspark.sql import functions as F

    # top token exactly at 0.30 (3 of 10) must NOT reject (strict >)
    df = spark.createDataFrame(
        [("a b c d e f g h a a",)], ["text"]
    ).select(repetition_reject_expr("text").alias("rej"))
    assert df.collect()[0]["rej"] is False


# ---- resize (REAL nearest-neighbor for BMP) ----
def test_resize_bmp_local_matches_numpy_reference():
    import numpy as np

    blob = multimodal.encode_bmp(17, 9, seed=3)  # odd width → row padding
    out = multimodal.resize_bmp(blob, 8, 4)
    w, h, _ = multimodal.decode_bmp(out)
    assert (w, h) == (8, 4)
    # exact nearest-neighbor reference on the raw pixel rows
    _, _, rows, _ = multimodal._bmp_pixel_rows(blob)
    px = rows.reshape(9, 17, 3)
    yi = (np.arange(4) * 9) // 4
    xi = (np.arange(8) * 17) // 8
    want = px[yi][:, xi]
    _, _, got_rows, _ = multimodal._bmp_pixel_rows(out)
    assert np.array_equal(got_rows.reshape(4, 8, 3), want)


def test_resize_images_dataframe(spark):
    df = multimodal.make_real_media_df(spark, 12)
    out = multimodal.resize_images(df, 8, 6).collect()
    assert len(out) == 12
    for r in out:
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (8, 6)
            w, h, _ = multimodal.decode_bmp(bytes(r["content"]))
            assert (w, h) == (8, 6)
        else:
            assert r["width"] is None and r["height"] is None
            # non-image blobs pass through byte-identical
            assert bytes(r["content"])[:4] == b"RIFF"


def test_resize_upscale_and_identity():
    blob = multimodal.encode_bmp(8, 8, seed=1)
    up = multimodal.resize_bmp(blob, 16, 16)
    w, h, _ = multimodal.decode_bmp(up)
    assert (w, h) == (16, 16)
    same = multimodal.resize_bmp(blob, 8, 8)
    assert multimodal.decode_bmp(same) == multimodal.decode_bmp(blob)


def test_resize_fake_rewrites_header(spark):
    df = multimodal.make_fake_media_df(spark, 6)
    out = multimodal.resize_images(df, 4, 4, fake=True).collect()
    for r in out:
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (4, 4)


def test_resize_stub_raises_on_fake_blob_without_flag(spark):
    df = multimodal.make_fake_media_df(spark, 3)
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|resizing"):
        multimodal.resize_images(df, 4, 4, fake=False).collect()


# ---- resample (REAL nearest-index for PCM16 WAV) ----
def test_resample_wav_local_matches_numpy_reference():
    import numpy as np

    blob = multimodal.encode_wav_pcm16(1600, 16_000, seed=5)
    out = multimodal.resample_wav(blob, 8_000)
    ch, rate, dur, _ = multimodal.decode_wav(out)
    assert (ch, rate, dur) == (1, 8_000, 100)  # duration preserved
    _, _, pcm_in = multimodal._wav_pcm(blob)
    _, _, pcm_out = multimodal._wav_pcm(out)
    fi = (np.arange(800) * 1600) // 800
    assert np.array_equal(pcm_out, pcm_in[fi])


def test_resample_wav_upsample_and_stereo():
    import numpy as np

    blob = multimodal.encode_wav_pcm16(400, 8_000, channels=2, seed=7)
    out = multimodal.resample_wav(blob, 16_000)
    ch, rate, dur, _ = multimodal.decode_wav(out)
    assert (ch, rate) == (2, 16_000)
    assert dur == 50  # 400 frames @ 8k = 50ms, preserved
    _, _, pcm = multimodal._wav_pcm(out)
    assert pcm.size == 800 * 2


def test_resample_audio_dataframe(spark):
    df = multimodal.make_real_media_df(spark, 12)
    out = multimodal.resample_audio(df, 8_000).collect()
    assert len(out) == 12
    for r in out:
        if r["kind"] == "audio":
            assert r["sample_rate"] == 8_000
            ch, rate, dur, _ = multimodal.decode_wav(bytes(r["content"]))
            assert rate == 8_000
            assert r["duration_ms"] == dur
        else:
            assert r["sample_rate"] is None
            assert bytes(r["content"])[:2] == b"BM"  # image passes through


# ---- top-down BMP (negative header height) ----
def _make_top_down_bmp(pixels):
    """Encode (h, w, 3) pixels as a TOP-DOWN BMP: rows stored top-first,
    header height negative — the other legal BMP orientation."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    flat = pixels.reshape(h, row_bytes)
    for r in range(h):  # stored order == top-down
        body += flat[r].tobytes()
        body += b"\x00" * pad
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(body), np.asarray(pixels)


def test_resize_bmp_top_down_orientation_preserved():
    """A top-down BMP must resize to the same rendered ORIENTATION as the
    equivalent bottom-up BMP (regression: the resized top-down image came
    out vertically flipped because the output is always encoded bottom-up).
    Rows are color-coded by logical position so a flip is unambiguous."""
    import numpy as np

    # logical row r (top-down) has constant value 40*r
    px = np.repeat(
        (np.arange(6, dtype=np.uint8) * 40)[:, None, None], 10 * 3, axis=1
    ).reshape(6, 10, 3)
    td_blob, _ = _make_top_down_bmp(px)
    bu_blob = multimodal.encode_bmp_pixels(px[::-1])  # same image, bottom-up
    assert multimodal.decode_bmp(td_blob) == multimodal.decode_bmp(bu_blob)
    out_td = multimodal.resize_bmp(td_blob, 5, 3)
    # rendered logical rows (top-down) of the bottom-up-encoded output
    _, _, rows, top_down = multimodal._bmp_pixel_rows(out_td)
    assert not top_down  # output is always bottom-up
    got_logical = rows.reshape(3, 5, 3)[::-1]
    # stored==logical order for a top-down input, so NN picks logical rows
    # 0,2,4 → values 0,80,160 — top row darkest. Pre-fix this came out
    # [160,80,0] (flipped).
    assert [int(r[0][0]) for r in got_logical] == [0, 80, 160]
    # bottom-up input keeps its orientation too (logical rows 1,3,5)
    out_bu = multimodal.resize_bmp(bu_blob, 5, 3)
    _, _, rows_bu, _ = multimodal._bmp_pixel_rows(out_bu)
    got_bu = rows_bu.reshape(3, 5, 3)[::-1]
    assert [int(r[0][0]) for r in got_bu] == [40, 120, 200]


def test_wav_truncated_data_chunk():
    """A data chunk that is not a whole number of frames decodes by
    truncating to whole frames instead of raising an opaque numpy error."""
    blob = multimodal.encode_wav_pcm16(100, 8_000, channels=2, seed=1)
    # append 3 stray bytes inside the data chunk (mid-sample + mid-frame)
    import struct

    data_pos = blob.rindex(b"data")
    (dlen,) = struct.unpack_from("<I", blob, data_pos + 4)
    bad = (
        blob[: data_pos + 4]
        + struct.pack("<I", dlen + 3)
        + blob[data_pos + 8 :]
        + b"\x01\x02\x03"
    )
    ch, rate, dur, amp = multimodal.decode_wav(bad)
    assert (ch, rate, dur) == (2, 8_000, 12)  # 100 whole frames kept
    out = multimodal.resample_wav(bad, 4_000)  # must not raise
    ch2, rate2, _, _ = multimodal.decode_wav(out)
    assert (ch2, rate2) == (2, 4_000)


# ---- PNG (REAL decode via stdlib zlib inflate + scanline unfiltering) ----
def test_png_roundtrip_all_filters():
    """decode_png recovers the exact pixels for every scanline filter type
    (None/Sub/Up/Average/Paeth) and every supported channel count."""
    import numpy as np

    rng = np.random.default_rng(21)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(7, 11, ch), dtype=np.uint8)
        for ftype in range(5):
            blob = multimodal.encode_png_pixels(px, filter_type=ftype)
            w, h, ch2, got = multimodal._png_pixels(blob)
            assert (w, h, ch2) == (11, 7, ch), (ftype, ch)
            assert np.array_equal(got, px), (ftype, ch)
            gw, gh, mean = multimodal.decode_png(blob)
            assert (gw, gh) == (11, 7)
            assert abs(mean - float(px.mean())) < 1e-9


def test_png_resize_matches_numpy_reference():
    import numpy as np

    rng = np.random.default_rng(33)
    px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    blob = multimodal.encode_png_pixels(px, filter_type=4)
    out = multimodal.resize_png(blob, 6, 4)
    w, h, _, got = multimodal._png_pixels(out)
    assert (w, h) == (6, 4)
    yi = (np.arange(4) * 9) // 4
    xi = (np.arange(6) * 13) // 6
    assert np.array_equal(got, px[yi][:, xi])


def test_png_unsupported_variants_raise():
    import struct

    import pytest as _pytest

    blob = multimodal.encode_png(5, 5, seed=2)
    # corrupt IHDR to 16-bit depth → NotImplementedError, not garbage
    ihdr_pos = blob.index(b"IHDR")
    bad_depth = bytearray(blob)
    bad_depth[ihdr_pos + 12] = 16
    with _pytest.raises(NotImplementedError, match="8-bit"):
        multimodal.decode_png(bytes(bad_depth))
    bad_palette = bytearray(blob)
    bad_palette[ihdr_pos + 13] = 3  # palette color type
    with _pytest.raises(NotImplementedError, match="palette"):
        multimodal.decode_png(bytes(bad_palette))
    with _pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_png(b"nope" * 4)
    truncated = multimodal.encode_png_pixels(
        __import__("numpy").zeros((4, 4, 3), dtype="uint8")
    )
    import zlib

    # IDAT inflates to the wrong length → clear ValueError
    idat_pos = truncated.index(b"IDAT")
    (ilen,) = struct.unpack_from(">I", truncated, idat_pos - 4)
    short = zlib.compress(b"\x00" * 5)
    doctored = (
        truncated[: idat_pos - 4]
        + struct.pack(">I", len(short))
        + b"IDAT"
        + short
        + struct.pack(">I", zlib.crc32(b"IDAT" + short) & 0xFFFFFFFF)
        + truncated[idat_pos + 4 + ilen + 4 :]
    )
    with _pytest.raises(ValueError, match="length mismatch"):
        multimodal.decode_png(doctored)


def test_png_through_dataframe_kernels(spark):
    """PNG blobs flow through the same mapInPandas decode/resize kernels as
    BMP — no fake flag needed (the decode is real)."""
    rows = [
        (100, "image", multimodal.encode_png(12, 8, seed=1), "png", 12, 8, None),
        (101, "image", multimodal.encode_bmp(12, 8, seed=2), "bmp", 12, 8, None),
        (102, "audio", multimodal.encode_wav_pcm16(800, 8_000, seed=3), "wav",
         None, None, 100),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    decoded = {r["media_id"]: r for r in multimodal.decode_media(df).collect()}
    assert decoded[100]["decoded_kind"] == 1
    assert (decoded[100]["decoded_width"], decoded[100]["decoded_height"]) == (12, 8)
    resized = {r["media_id"]: r for r in multimodal.resize_images(df, 6, 4).collect()}
    assert bytes(resized[100]["content"])[:8] == multimodal._PNG_MAGIC
    w, h, _ = multimodal.decode_png(bytes(resized[100]["content"]))
    assert (w, h) == (6, 4)


# ---- sequence packing ----
def test_pack_sequences_boundary_rule(spark):
    """Hand-computed: docs of 300/300/300 tokens at seq_len=512 → cum_before
    0/300/600 → packs 0/0/1, offsets 0/300/88."""
    from approximate_query_engine_spark.functions.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 300)], "doc_id long, n_tokens int"
    )
    rows = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, 512).collect()
    }
    assert rows == {1: (0, 0, 0), 2: (0, 0, 300), 3: (0, 1, 88)}


def test_pack_sequences_sharding_is_independent(spark):
    """Packing a shard alone gives the same assignment as packing it among
    other shards (per-shard windows do not interact)."""
    from approximate_query_engine_spark.functions.packing import pack_sequences

    rows = [(i, 100 + 37 * (i % 7), i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int, dom int")
    both = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, 256, shard_col="dom").collect()
    }
    solo = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(
            df.filter("dom = 1"), 256, shard_col="dom"
        ).collect()
    }
    assert solo == {k: v for k, v in both.items() if k % 3 == 1}


def test_pack_stats_fill(spark):
    from approximate_query_engine_spark.functions.packing import (
        pack_sequences,
        pack_stats,
    )

    df = spark.createDataFrame(
        [(i, 128) for i in range(8)], "doc_id long, n_tokens int"
    )
    stats = pack_stats(pack_sequences(df, 512), 512).collect()
    # 8 x 128 = 1024 tokens = exactly 2 full packs of 4 docs
    assert sorted((r["pack_id"], r["n_docs"], r["pack_tokens"], r["fill_permille"]) for r in stats) == [
        (0, 4, 512, 1000),
        (1, 4, 512, 1000),
    ]


def test_pack_sequences_hash_sharding(spark):
    from approximate_query_engine_spark.functions.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n_tokens int"
    )
    out = pack_sequences(df, 64, n_shards=4)
    shards = {r["shard"] for r in out.select("shard").distinct().collect()}
    assert shards <= {0, 1, 2, 3} and len(shards) > 1


def test_pack_sequences_single_shuffle_plan(spark):
    """Pack assignment + pack stats must cost exactly ONE shuffle (the
    shard-keyed window; the groupBy reuses the same hash partitioning).
    A second Exchange would double the data movement at 100 TB."""
    from approximate_query_engine_spark.functions.packing import (
        pack_sequences,
        pack_stats,
    )

    df = spark.createDataFrame(
        [(i, 100, i % 3) for i in range(100)],
        "doc_id long, n_tokens int, dom int",
    )
    out = pack_stats(pack_sequences(df, 512, shard_col="dom"), 512)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_write_training_shards_manifest_audits_written_data(spark, tmp_path):
    """The shard writer must land one directory per shard with documents
    in pack order, and the manifest (computed from the written files, not
    the plan) must reconcile exactly with the input."""
    import os

    from pyspark.sql import functions as F

    from approximate_query_engine_spark.functions.packing import (
        pack_sequences,
        write_training_shards,
    )

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 10).alias("n_tokens"),
    )
    packed = pack_sequences(df, 512, n_shards=4)
    out = str(tmp_path / "shards")
    manifest = write_training_shards(packed, out)
    rows = {r["shard"]: r for r in manifest.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r["n_docs"] for r in rows.values()) == 500
    exact_tokens = df.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows.values()) == exact_tokens
    # one directory per shard; read-back round-trips every document
    assert sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    ) == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(out)
    assert back.count() == 500
    # within a shard file, documents are laid down in pack order
    one = (
        back.where("shard = 1")
        .select("pack_id", "pack_offset")
        .collect()
    )
    assert one == sorted(one, key=lambda r: (r["pack_id"], r["pack_offset"]))


def test_pii_count_and_redact(spark):
    """PII hygiene: counts are per-kind and scan-side; redaction replaces
    every occurrence in pattern order and is idempotent."""
    from approximate_query_engine_spark.functions.text import (
        count_pii,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail me at a.user+x@test-mail.org or b@x.io thanks"),
            (2, "server 10.0.0.1 called 192.168.1.255 twice"),
            (3, "call +1 555-123-4567 or 555-123-4567 now"),
            (4, "clean document with no sensitive content"),
        ],
        "doc_id long, text string",
    )
    counts = {r["doc_id"]: r for r in count_pii(df).collect()}
    assert counts[1]["pii_email"] == 2 and counts[1]["pii_phone"] == 0
    assert counts[2]["pii_ipv4"] == 2
    assert counts[3]["pii_phone"] == 2
    assert all(counts[4][c] == 0 for c in ("pii_email", "pii_ipv4", "pii_phone"))
    red = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    assert red[1] == "mail me at [PII] or [PII] thanks"
    assert red[2] == "server [PII] called [PII] twice"
    assert red[3] == "call [PII] or [PII] now"
    assert red[4] == "clean document with no sensitive content"
    # idempotent: redacting redacted text is a no-op
    twice = {r["doc_id"]: r["text"] for r in redact_pii(redact_pii(df)).collect()}
    assert twice == red
    # the synthetic corpus is clean — counts aggregate to zero (and the
    # whole thing stays one scan: no Exchange in the plan)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    agg = count_pii(docs).selectExpr(
        "SUM(pii_email) e", "SUM(pii_ipv4) i", "SUM(pii_phone) p"
    ).collect()[0]
    assert (agg["e"], agg["i"], agg["p"]) == (0, 0, 0)
    plan = count_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_windows_and_overlap(spark):
    """Chunking invariants: consecutive full chunks share exactly
    `overlap` tokens, every token index is covered, short/empty docs
    behave (single short chunk / no rows), and bad params raise."""
    import pytest as _pytest

    from approximate_query_engine_spark.functions.packing import (
        chunk_documents,
    )

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),
        (2, "a b c"),
        (3, ""),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap_tokens=1)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in out.collect()
    }
    # step 3: starts 0,3,6 over 10 tokens (start 9's window is wholly
    # inside chunk 2 — emitting it would duplicate training content)
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert (1, 3) not in got
    assert got[(2, 0)] == ("a b c", 3)
    assert not any(d in (3, 4) for d, _c in got)  # empty docs: no rows
    # coverage: concatenating chunks with overlap dropped reconstructs
    toks = []
    for cid in range(3):
        ctoks = got[(1, cid)][0].split(" ")
        toks.extend(ctoks if cid == 0 else ctoks[1:])
    assert toks == [f"t{i}" for i in range(10)]
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)
