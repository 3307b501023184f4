"""Training-corpus assembly queries: sequence packing, temperature
resampling of the language mix, and SemDeDup-style semantic dedup —
the three operations that sit between a cleaned corpus and a training
dataloader. Each with a DuckDB twin under the same portability contract
as plans.training_queries (portable md5 hashes, integer arithmetic,
floats rounded at fixed precision on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators import similarity as S
from sgb_data_validator_spark.operators.dedup import cosine_with_norms, dot
from sgb_data_validator_spark.operators.packing import PACK_STRIDE, pack_sequences
from sgb_data_validator_spark.operators.sampling import temperature_sample
from sgb_data_validator_spark.plans.training_queries import (
    DIM,
    SQL_COS,
    SQL_QUALITY_SCORE,
    SQL_VECTORS_TWINS,
    _t,
    _vectors_with_twins,
)

PACK_BUDGET = 256   # tokens per packed sequence
PACK_BUCKETS = 8    # independent packing streams (≈ cluster parallelism)
TEMP_ALPHA = 0.5    # language-mix flattening temperature
SEM_CENT_MOD = 40   # bootstrap centroid stride (shared with extra_queries)
SEM_TAU = 0.9       # within-cell cosine duplicate threshold


# ------------------------------------------------------------- packing

def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing manifest over documents (tokens =
    whitespace count, the oracle-replayable stand-in for a real BPE
    count — swap token_count_regex or a tokenizer UDF in production)."""
    from sgb_data_validator_spark.operators import textanalysis as T

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        T.token_count_ws(F.col("text")).alias("n_tokens"),
    )
    return pack_sequences(toks, "doc_id", "n_tokens", PACK_BUDGET, PACK_BUCKETS).select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.col("bucket").cast("bigint").alias("bucket"),
        "begin_offset",
        "pack_id",
        "offset_in_pack",
        "spans_boundary",
    )


SQL_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT cast(doc_id AS bigint) AS doc_id,
         cast(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END AS bigint) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
base AS (
  SELECT doc_id, n_tokens,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT) % {PACK_BUCKETS} AS bucket,
         (('0x' || substr(md5('pack' || chr(31) || doc_id::VARCHAR), 1, 15))::BIGINT) AS ord
  FROM toks WHERE n_tokens > 0
),
c AS (
  SELECT doc_id, n_tokens, bucket,
         cast(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING
         ) AS bigint) AS cum
  FROM base
)
SELECT doc_id, n_tokens, bucket,
       cast(cum - n_tokens AS bigint) AS begin_offset,
       cast(bucket * {PACK_STRIDE} + (cum - n_tokens) // {PACK_BUDGET} AS bigint) AS pack_id,
       cast((cum - n_tokens) % {PACK_BUDGET} AS bigint) AS offset_in_pack,
       (cum - n_tokens) // {PACK_BUDGET} <> (cum - 1) // {PACK_BUDGET} AS spans_boundary
FROM c
"""


# ------------------------------------------- temperature resampling

def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature flattening of the documents language mix:
    per-language keep-rates computed in-plan from the counts, membership
    by the portable md5 basis-point rule (operators/sampling.py).
    Row filter is (text, lang) NOT NULL — identical to q_mix_report's,
    so the report's kept counts/rates and this kept set stay in exact
    correspondence even on corpora with null-text/non-null-lang rows."""
    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    kept = temperature_sample(
        docs.select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang"),
        "doc_id",
        "lang",
        alpha=TEMP_ALPHA,
        keep_rate=True,
    )
    return kept.select("doc_id", "lang", F.col("__rate_bp").alias("rate_bp"))


SQL_TEMPERATURE_SAMPLE = f"""
WITH d AS (
  SELECT cast(doc_id AS bigint) AS doc_id, lang
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
),
c AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
r AS (
  SELECT lang,
         cast(floor(round(10000 * pow((SELECT min(n) FROM c)::DOUBLE / n,
                                      {1.0 - TEMP_ALPHA}), 6)) AS bigint) AS rate_bp
  FROM c
)
SELECT d.doc_id, d.lang, r.rate_bp
FROM d JOIN r USING (lang)
WHERE (('0x' || substr(md5(d.lang || chr(31) || d.doc_id::VARCHAR), 1, 15))::BIGINT) % 10000
      < r.rate_bp
"""


# ------------------------------------------------- semantic dedup

def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pass: one Lloyd refinement of
    the bootstrap centroids (operators/similarity.py:kmeans_step), every
    vector assigned to its refined cell with the shuffle-free broadcast
    fold (ivf_assign), then pairwise cosine INSIDE cells only — Σ cell²
    work instead of the n² all-pairs scan, the shape that survives a
    100 TB embedding table. Twins (scaled copies) land in the same cell
    by construction, so recall on true duplicates is exact."""
    vecs = _vectors_with_twins(spark, sf_dir)
    cent0 = vecs.where(F.col("vec_id") % SEM_CENT_MOD == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        dot(F.col("v"), F.col("v")).alias("cn"),
    )
    cent1 = S.kmeans_step(vecs, cent0, "vec_id", "v").select("cid", "cv", "cn")
    asg = S.ivf_assign(vecs, cent1, "vec_id", "v", "vid")
    a = asg.select(
        F.col("cid").alias("cell"),
        F.col("vid").alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_n").alias("na"),
    )
    b = asg.select(
        F.col("cid").alias("cell"),
        F.col("vid").alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_n").alias("nb"),
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            F.round(
                cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")),
                4,
            ).alias("cos"),
        )
    )
    return pairs.where(F.col("cos") >= SEM_TAU)


SQL_SEMANTIC_DEDUP = f"""
WITH {SQL_VECTORS_TWINS},
cent AS (SELECT vec_id AS cid, v AS cv FROM alle WHERE vec_id % {SEM_CENT_MOD} = 0),
asg AS (
  SELECT a.vec_id, a.v, c.cid,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY {SQL_COS.format(a="a.v", b="c.cv")} DESC, c.cid ASC
         ) AS rnk
  FROM alle a CROSS JOIN cent c
),
cells AS (SELECT vec_id, v, cid FROM asg WHERE rnk = 1),
comp AS (SELECT cid, r.i AS pos, v[r.i + 1] AS val FROM cells, range({DIM}) r(i)),
m AS (SELECT cid, pos, round(avg(val), 6) AS mean FROM comp GROUP BY 1, 2),
cent2 AS (SELECT cid, list(mean ORDER BY pos ASC) AS cv FROM m GROUP BY cid),
asg2 AS (
  SELECT a.vec_id, a.v, c.cid,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY {SQL_COS.format(a="a.v", b="c.cv")} DESC, c.cid ASC
         ) AS rnk
  FROM alle a CROSS JOIN cent2 c
),
cells2 AS (SELECT vec_id, v, cid FROM asg2 WHERE rnk = 1)
SELECT cast(a.cid AS bigint) AS cell,
       a.vec_id AS id_a, b.vec_id AS id_b,
       {SQL_COS.format(a="a.v", b="b.v")} AS cos
FROM cells2 a JOIN cells2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE {SQL_COS.format(a="a.v", b="b.v")} >= {SEM_TAU}
"""


# --------------------------------------------- percentile quality gate

GATE_Q = 0.25  # drop the bottom quartile by quality score


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative quality gating: keep documents at or above the
    corpus p-quantile of the quality score — the data-driven form of a
    hand-set threshold (the cut point moves with the corpus, so the same
    query works on any snapshot). The exact interpolated percentile is
    ONE row (partial-agg sketch per task, merged once), broadcast back
    onto the scoring projection; the fact is never shuffled. At 10^12
    rows swap `percentile` for `percentile_approx` — same plan shape."""
    from sgb_data_validator_spark.operators import scorers

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    scored = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        scorers.quality_score(F.col("text")).alias("score"),
    )
    thr = scored.agg(F.expr(f"percentile(score, {GATE_Q})").alias("threshold"))
    return (
        scored.crossJoin(F.broadcast(thr))
        .where(F.col("score") >= F.col("threshold"))
        .select("doc_id", "score", F.round("threshold", 6).alias("threshold"))
    )


SQL_QUALITY_GATE = f"""
WITH q AS ({SQL_QUALITY_SCORE.strip()}),
t AS (SELECT quantile_cont(score, {GATE_Q}) AS threshold FROM q)
SELECT q.doc_id, q.score, round(t.threshold, 6) AS threshold
FROM q CROSS JOIN t WHERE q.score >= t.threshold
"""


# ------------------------------------------------ language-mix report

def q_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus accounting before/after temperature
    resampling: document and (whitespace-)token counts, token share in
    integer basis points, and the kept-side counts under the α=0.5 rule
    — the mix table a training run is provisioned from. Two map-side-
    combined aggregations over one scan; kept-side flags reuse the
    portable md5 membership predicate so the report matches the actual
    `temperature_sample` output exactly."""
    from sgb_data_validator_spark.operators import textanalysis as T
    from sgb_data_validator_spark.operators.sampling import sample_bucket

    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    base = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        T.token_count_ws(F.col("text")).alias("n_tokens"),
        sample_bucket(F.col("lang"), F.col("doc_id")).alias("bucket_bp"),
    )
    counts = base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    cmin = counts.agg(F.min("n_docs").alias("cmin"))
    total = counts.agg(F.sum("n_tokens").alias("total_tokens"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        "lang",
        F.floor(
            F.round(
                F.lit(10000)
                * F.pow(F.col("cmin").cast("double") / F.col("n_docs"), F.lit(0.5)),
                6,
            )
        ).alias("rate_bp"),
    )
    kept = (
        base.join(F.broadcast(rates), "lang")
        .where(F.col("bucket_bp") < F.col("rate_bp"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("kept_docs"),
            F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
        )
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(rates), "lang")
        .join(F.broadcast(kept), "lang", "left")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.floor(F.col("n_tokens") * 10000 / F.col("total_tokens"))
            .cast("bigint")
            .alias("share_bp"),
            F.col("rate_bp").cast("bigint").alias("rate_bp"),
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("bigint").alias("kept_docs"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("bigint").alias("kept_tokens"),
        )
    )


SQL_MIX_REPORT = """
WITH base AS (
  SELECT cast(doc_id AS bigint) AS doc_id, lang,
         cast(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END AS bigint) AS n_tokens,
         (('0x' || substr(md5(lang || chr(31) || doc_id::VARCHAR), 1, 15))::BIGINT) % 10000
           AS bucket_bp
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
),
counts AS (
  SELECT lang, cast(count(*) AS bigint) AS n_docs,
         cast(sum(n_tokens) AS bigint) AS n_tokens
  FROM base GROUP BY 1
),
rates AS (
  SELECT lang,
         cast(floor(round(10000 * pow((SELECT min(n_docs) FROM counts)::DOUBLE / n_docs,
                                      0.5), 6)) AS bigint) AS rate_bp
  FROM counts
),
kept AS (
  SELECT b.lang, cast(count(*) AS bigint) AS kept_docs,
         cast(sum(b.n_tokens) AS bigint) AS kept_tokens
  FROM base b JOIN rates r USING (lang)
  WHERE b.bucket_bp < r.rate_bp GROUP BY 1
)
SELECT c.lang, c.n_docs, c.n_tokens,
       cast(floor(c.n_tokens * 10000 / (SELECT sum(n_tokens) FROM counts)) AS bigint)
         AS share_bp,
       r.rate_bp,
       cast(coalesce(k.kept_docs, 0) AS bigint) AS kept_docs,
       cast(coalesce(k.kept_tokens, 0) AS bigint) AS kept_tokens
FROM counts c
JOIN rates r USING (lang)
LEFT JOIN kept k USING (lang)
"""


# ------------------------------------------------- train/val/test split

SPLIT_TRAIN_BP = 9800
SPLIT_VAL_BP = 9900


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split bucket hashes
    the CONTENT fingerprint, not the row id, so exact and reorder-only
    duplicates land in the same split by construction — the guard an
    id-keyed split silently violates when the corpus still contains
    dups. Zero shuffle: one md5 + two comparisons per row in the scan
    stage. See operators.sampling.split_assign."""
    from sgb_data_validator_spark.operators.sampling import split_assign

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return split_assign(
        docs, "doc_id", "text", train_bp=SPLIT_TRAIN_BP, val_bp=SPLIT_VAL_BP
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.col("split_bucket").cast("bigint").alias("split_bucket"),
        "split",
    )


SQL_SPLIT_ASSIGN = f"""
WITH f AS (
  SELECT cast(doc_id AS bigint) AS doc_id, lang,
         (('0x' || substr(md5(md5(array_to_string(
              list_sort(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))),
              ' '))), 1, 15))::BIGINT) % 10000 AS split_bucket
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, lang, split_bucket,
       CASE WHEN split_bucket < {SPLIT_TRAIN_BP} THEN 'train'
            WHEN split_bucket < {SPLIT_VAL_BP} THEN 'val'
            ELSE 'test' END AS split
FROM f
"""


PACKING_QUERIES: dict[str, tuple] = {
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "temperature_sample": (q_temperature_sample, SQL_TEMPERATURE_SAMPLE),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "quality_gate": (q_quality_gate, SQL_QUALITY_GATE),
    "mix_report": (q_mix_report, SQL_MIX_REPORT),
    "split_assign": (q_split_assign, SQL_SPLIT_ASSIGN),
}
