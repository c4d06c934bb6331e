"""Sequence packing: assign documents to fixed-token-budget training
sequences ("packs") — the standard LLM-pretraining step that concatenates
documents up to a context length so no sequence slot is wasted.

The packing rule here is the deterministic streaming one: order documents
by id within a shard, keep a running token total, and start a new pack
each time the running total crosses a multiple of ``seq_len`` (a document
that straddles a boundary belongs to the pack where it starts; the
consumer truncates or pads — identical to the "concat then chunk"
convention). This rule is a pure window cumsum, so it is:

- **shard-parallel**: each shard packs independently under one window
  (`PARTITION BY shard ORDER BY id`) — one bounded shuffle keyed on the
  shard, no global ordering. At 100 TB choose enough shards that one
  shard's documents fit an executor's window spill budget; pack ids are
  (shard, local_pack), globally unique without coordination.
- **engine-replayable**: any SQL engine reproduces the exact assignment
  (ordered cumsum is deterministic), so DuckDB can oracle-check it.

A true bin-packing (first-fit-decreasing) wastes less tail space but is
sequential and order-sensitive; the streaming rule is what production
pretraining pipelines actually use, because documents are chunked anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    n_shards: int | None = None,
) -> DataFrame:
    """→ input columns + (shard, pack_id, pack_offset).

    ``pack_id`` is the pack index within the shard; ``pack_offset`` is the
    document's token offset from the start of its pack. Sharding: pass
    ``shard_col`` (e.g. a domain/date column) to pack within existing
    groups, or ``n_shards`` to hash-shard by id; default is a single
    shard (fine locally, not at warehouse scale — see module docstring).
    """
    if shard_col is not None:
        shard = F.col(shard_col)
    elif n_shards is not None:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    else:
        shard = F.lit(0)
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer `div`, not float division + cast: a double round-trip loses
    # exactness once a shard's running total nears 2^53, silently
    # misassigning packs at warehouse scale
    return (
        out.withColumn(
            "__cum_before",
            (F.sum(token_col).over(w) - F.col(token_col)).cast("bigint"),
        )
        .withColumn("pack_id", F.expr(f"__cum_before div {int(seq_len)}"))
        .withColumn(
            "pack_offset", F.pmod("__cum_before", F.lit(seq_len)).cast("bigint")
        )
        .drop("__cum_before")
    )


def pack_stats(
    packed: DataFrame, seq_len: int, token_col: str = "n_tokens"
) -> DataFrame:
    """Per-(shard, pack) fill accounting: n_docs, token total, and fill
    permille vs ``seq_len`` (integer arithmetic — engine-portable). The
    final pack of each shard is naturally under-filled; every other pack
    holds >= seq_len tokens of starts-here documents' budget by
    construction of the boundary rule."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).cast("bigint").alias("pack_tokens"),
        (F.sum(token_col) * 1000 / F.lit(seq_len))
        .cast("bigint")
        .alias("fill_permille"),
    )


def write_training_shards(
    packed: DataFrame,
    out_dir: str,
    token_col: str = "n_tokens",
) -> DataFrame:
    """Materialize packed sequences as training shards and return the
    manifest (one row per shard: packs, docs, tokens, files).

    The sink shape that matters at warehouse scale: ONE shuffle keyed on
    the shard (`repartition("shard")` — co-locates each shard in a single
    task), documents laid down in pack order
    (`sortWithinPartitions`), and `partitionBy("shard")` so every shard
    is its own directory a trainer can stream independently. The manifest
    is computed from the data as WRITTEN (read back from ``out_dir``),
    not from the plan — it audits what actually landed, catching partial
    writes.
    """
    spark = packed.sparkSession
    (
        packed.repartition("shard")
        .sortWithinPartitions("shard", "pack_id", "pack_offset")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir)
    return (
        written.groupBy("shard")
        .agg(
            F.countDistinct("pack_id").alias("n_packs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col)).cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into fixed-size token windows with overlap —
    the context-window preparation step (pack_sequences' dual: packing
    joins short docs, chunking splits long ones). Whitespace tokens;
    chunk starts advance by ``chunk_tokens - overlap_tokens`` so
    consecutive chunks share exactly ``overlap_tokens`` tokens (the last
    chunk may be shorter). → one row per (doc, chunk): ``chunk_id``,
    ``chunk_text``, ``n_chunk_tokens``. A trailing window that is wholly
    contained in the previous chunk (start > 0 and start + overlap >= n)
    is never emitted — it would inject duplicated content into training
    data; chunk text is normalized to single-space-joined tokens.

    Scale shape: split/sequence/posexplode/slice are all built-in
    expressions — a scan-side flatMap with zero shuffle and no Python;
    output rows ≈ corpus_tokens / step regardless of document skew.
    Empty/whitespace-only documents yield no rows (nothing to window).
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < chunk ({chunk_tokens})"
        )
    step = chunk_tokens - overlap_tokens
    # true whitespace tokenization (\s+): tabs/newlines are separators,
    # not token glue — mirrored by the q101 DuckDB oracle
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    # last useful start: any start > n - overlap - 1 (other than 0)
    # yields a window wholly inside the previous chunk — cap it out
    last_start = F.greatest(
        F.lit(0), F.col("__n") - F.lit(overlap_tokens) - 1
    )
    out = (
        df.withColumn("__toks", toks)
        .withColumn("__n", F.array_size("__toks"))
        .where(F.col("__n") > 0)
        .select(
            id_col,
            "__toks",
            "__n",
            F.posexplode(
                F.sequence(F.lit(0), last_start, F.lit(step))
            ).alias("chunk_id", "__start"),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__toks"), F.col("__start") + 1, chunk_tokens
                ),
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("__start")
            ).cast("int").alias("n_chunk_tokens"),
        )
    )
    return out
