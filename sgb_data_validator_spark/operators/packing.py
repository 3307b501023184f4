"""Sequence packing for LLM pretraining corpora.

Pretraining consumes fixed-length token sequences, not documents: the
corpus is concatenated in a deterministic order and chunked into packs
of exactly ``budget`` tokens (documents may span a pack boundary —
the standard concat-and-chunk regime). The operator answers, for every
document, WHERE it lands: which pack, at what offset, and whether it
straddles a boundary — the manifest a data loader needs to build
packed batches without re-tokenizing.

Spark-first scale shape:

* a GLOBAL concatenation order would be a single-partition window sort
  (driver-killer at 100 TB). Instead documents are sharded into
  ``n_buckets`` independent streams by a portable hash of the id —
  packs never cross buckets, so each bucket packs independently. One
  hash-partitioned exchange + per-bucket sort; bucket count scales
  with the cluster (set it ≈ shuffle parallelism).
* within a bucket the order is (hash(id), id) — deterministic,
  engine-independent, and decorrelated from ingest order so packs mix
  sources (the same reason loaders shuffle before packing).
* all arithmetic is integer (token counts, cumulative sums, floor
  division) — the DuckDB oracle replays it bit-exactly.

Pack ids are globally unique: ``bucket * PACK_STRIDE + local_pack``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.dedup import portable_hash

#: max packs per bucket — 2^40 packs × budget tokens is far beyond any
#: single bucket's share even at 100 TB with a small n_buckets.
PACK_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign every document a (pack_id, offset) under concat-and-chunk
    packing with ``budget`` tokens per pack, sharded into ``n_buckets``
    independent streams.

    Returns one row per input row:
      id, n_tokens, bucket, begin_offset (position in the bucket's
      concatenated token stream), pack_id (globally unique), offset_in_pack,
      spans_boundary (true iff the document crosses a pack boundary).

    Zero-token documents are dropped (they occupy no stream positions
    and would otherwise alias the next document's offset).
    """
    # budget is interpolated into F.expr (integer DIV) and n_buckets into
    # a modulo: validate eagerly — budget <= 0 would yield NULL/div-zero
    # pack ids, n_buckets <= 0 NULLs the bucket and silently drops rows,
    # and a non-int budget would become arbitrary SQL-expression text
    if not isinstance(budget, int) or isinstance(budget, bool) or budget < 1:
        raise ValueError(f"budget must be a positive int, got {budget!r}")
    if not isinstance(n_buckets, int) or isinstance(n_buckets, bool) or n_buckets < 1:
        raise ValueError(f"n_buckets must be a positive int, got {n_buckets!r}")
    toks = F.col(token_col).cast("bigint")
    bucket = (portable_hash(F.col(id_col).cast("string")) % n_buckets).alias("bucket")
    base = df.where(toks > 0).select(
        F.col(id_col).alias("id"),
        toks.alias("n_tokens"),
        bucket,
        portable_hash(F.concat_ws("\x1f", F.lit("pack"), F.col(id_col).cast("string"))).alias(
            "__ord"
        ),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("__ord", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    # integer DIV, not floor(double /): a bucket's cumulative token count
    # at 100 TB approaches 2^53, where double division goes inexact —
    # the DuckDB twin's `//` is integer too, so the engines stay bit-equal
    staged = base.select(
        "id",
        "n_tokens",
        "bucket",
        (cum - F.col("n_tokens")).alias("begin_offset"),
        (cum - 1).alias("__last_offset"),
    )
    b = F.lit(budget)
    first_pack = F.expr(f"begin_offset DIV {budget}")
    packed = staged.select(
        "id",
        "n_tokens",
        "bucket",
        "begin_offset",
        (F.col("bucket") * PACK_STRIDE + first_pack).alias("pack_id"),
        (F.col("begin_offset") % b).alias("offset_in_pack"),
        # last token of the doc sits at cum-1; compare its pack to the first's
        (first_pack != F.expr(f"__last_offset DIV {budget}")).alias("spans_boundary"),
    )
    return packed


def token_window_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    stride: int,
    carry_cols: tuple[str, ...] = (),
    tokenizer: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """Sliding token-window chunking: split ``text_col`` on whitespace
    and emit one row per window of ``window`` tokens advancing by
    ``stride`` (the RAG / long-context chunking regime; the final
    window may be shorter). Returns (id, chunk_idx, chunk_tokens,
    chunk_hash) — the hash is the portable md5 fingerprint of the
    space-joined window, so downstream chunk-level dedup composes with
    dedup_exact without re-carrying the text. ``carry_cols`` names
    small scalar columns (source, lang, part) copied onto every chunk
    row IN the projection — carrying them here is free (still narrow)
    and avoids a fact×fact join to re-attach them downstream.

    Spark-first scale shape: pure narrow codegen — split + sequence +
    posexplode run inside the scan stage, no shuffle, no UDF; the text
    column never enters an exchange (only the 4 scalar outputs do).
    Chunk starts come from ``F.sequence(0, size-1, stride)`` so a doc
    with n tokens yields ceil(n / stride) windows, each clamped by
    ``F.slice`` at the array end — identical to the DuckDB twin's
    ``range(0, len, stride)`` + 1-based inclusive list slicing.
    """
    if not isinstance(window, int) or isinstance(window, bool) or window < 1:
        raise ValueError(f"window must be a positive int, got {window!r}")
    if not isinstance(stride, int) or isinstance(stride, bool) or stride < 1:
        raise ValueError(f"stride must be a positive int, got {stride!r}")
    if tokenizer is None:
        # default: whitespace tokens. Trim ALL whitespace, not F.trim
        # (which strips only 0x20 — a tab/newline-padded doc would
        # otherwise emit empty-string tokens at the edges; caught by
        # the hypothesis adversary texts=['\t'])
        cleaned = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
        words = F.split(cleaned, r"\s+")
        keep = F.col(text_col).isNotNull() & (cleaned != "")
    else:
        # pluggable tokenizer (e.g. textanalysis.tokenize_bpe): any
        # Column->array<string> expression; window/stride then count in
        # ITS units, so budgets match the paired counter by construction
        words = tokenizer(F.col(text_col))
        keep = F.col(text_col).isNotNull() & (F.size(words) > 0)
    base = df.where(keep).select(
        F.col(id_col).alias("id"),
        *carry_cols,
        words.alias("__words"),
    )
    starts = F.sequence(F.lit(0), F.size("__words") - 1, F.lit(stride))
    exploded = base.select(
        "id", *carry_cols, "__words",
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__words"), F.col("__start") + 1, window)
    return exploded.select(
        "id",
        *carry_cols,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("chunk_tokens"),
        portable_hash(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )
