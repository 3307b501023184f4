"""Round-4 corpus-analysis + integrity queries, each with a DuckDB twin
under the established portability contract (portable md5 hashes, integer
arithmetic, ``round(…, 6)`` on ln-based doubles).

* token_chunks     — sliding token-window chunking of documents (the
                     RAG / long-context split; operators/packing.py:
                     token_window_chunks). Pure narrow codegen.
* group_topk       — deterministic per-language k-sample by smallest
                     portable hash, exact under skew via salted
                     two-phase top-k (operators/sampling.py:group_topk).
* tfidf_top_terms  — per-document top-k terms by tf·idf, the classic
                     corpus-characterization statistic (reference has
                     per-item profiling only, src/profiling.py; this is
                     its corpus-level analog).
* fd_check         — functional-dependency validation (determinant →
                     dependent must be single-valued), the aggregate-
                     level sibling of the reference's per-row type rules
                     (src/models.py:49-197); emits violating groups with
                     a two-example witness
                     (operators/referential.py:fd_violations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.packing import token_window_chunks
from sgb_data_validator_spark.operators.referential import fd_violations
from sgb_data_validator_spark.operators.sampling import group_topk

# token-window chunking: 32-token windows advancing 24 tokens (8-token
# overlap) — sized so the sf fixtures' ~40-200-token docs emit several
# chunks each, exercising both full and clamped final windows.
CHUNK_WINDOW = 32
CHUNK_STRIDE = 24

# per-language deterministic sample size
TOPK_K = 5

# tf-idf terms kept per document; ln rounding matches corpus_queries
TFIDF_K = 3
LN_ROUND = 6


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------- token-window chunking


def q_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into sliding token windows; emit the chunk
    manifest (doc_id, chunk_idx, chunk_tokens, chunk_hash). Scale shape:
    split + sequence + posexplode inside the scan stage — zero shuffle,
    zero UDF, text never enters an exchange."""
    docs = _t(spark, sf_dir, "documents")
    chunks = token_window_chunks(docs, "doc_id", "text", CHUNK_WINDOW, CHUNK_STRIDE)
    return chunks.select(
        F.col("id").cast("bigint").alias("doc_id"),
        "chunk_idx",
        "chunk_tokens",
        "chunk_hash",
    )


SQL_TOKEN_CHUNKS = f"""
WITH w AS (
  SELECT cast(doc_id AS bigint) AS doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
s AS (
  SELECT doc_id, words,
         unnest(range(0, len(words), {CHUNK_STRIDE})) AS start
  FROM w
)
SELECT doc_id,
       cast(start // {CHUNK_STRIDE} AS bigint) AS chunk_idx,
       cast(len(list_slice(words, start + 1, start + {CHUNK_WINDOW})) AS bigint)
         AS chunk_tokens,
       ('0x' || substr(md5(array_to_string(
            list_slice(words, start + 1, start + {CHUNK_WINDOW}), ' ')), 1, 15))::BIGINT
         AS chunk_hash
FROM s
"""


# -------------------------------------------- per-group deterministic k


def q_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language 5-doc sample (smallest portable hash
    wins); salted two-phase top-k so a hot language never lands in one
    task. The twin is the single-window form — identical rows."""
    docs = _t(spark, sf_dir, "documents")
    picked = group_topk(docs, "doc_id", "lang", TOPK_K)
    return picked.select(
        F.col("stratum").alias("lang"),
        F.col("key").cast("bigint").alias("doc_id"),
        "rank",
    )


SQL_GROUP_TOPK = f"""
WITH s AS (
  SELECT lang, cast(doc_id AS bigint) AS doc_id,
         ('0x' || substr(md5('topk' || chr(31) || doc_id::VARCHAR), 1, 15))::BIGINT
           AS ord
  FROM documents
)
SELECT lang, doc_id,
       cast(row_number() OVER (PARTITION BY lang ORDER BY ord, doc_id) AS bigint)
         AS rank
FROM s
QUALIFY rank <= {TOPK_K}
"""


# ------------------------------------------------------- tf-idf top terms


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by tf·idf (idf = ln(N/df), rounded at 6
    like every ln in the corpus tier). Scale shape: three narrow
    shuffles on progressively smaller frames — (doc_id, term) tf agg,
    term-window doc frequency, doc_id-window rank — with the corpus
    size N folded in as a broadcast one-row agg (never an eager
    count()). Text leaves the scan only as exploded terms."""
    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )
    terms = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    w_term = Window.partitionBy("term")
    with_df = tf.withColumn("df", F.count(F.lit(1)).over(w_term))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    scored = with_df.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.round(F.log(F.col("__n") / F.col("df")), LN_ROUND),
            LN_ROUND,
        ).alias("score"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn(
        "rank", F.row_number().over(w_doc).cast("bigint")
    ).where(F.col("rank") <= TFIDF_K)


SQL_TFIDF_TOP_TERMS = f"""
WITH d AS (
  SELECT cast(doc_id AS bigint) AS doc_id, text
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
t AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM d
),
tf AS (
  SELECT doc_id, term, cast(count(*) AS bigint) AS tf
  FROM t GROUP BY 1, 2
),
n AS (SELECT cast(count(*) AS double) AS n FROM d),
s AS (
  SELECT doc_id, term, tf,
         round(tf * round(ln(n.n / (count(*) OVER (PARTITION BY term))),
                          {LN_ROUND}), {LN_ROUND}) AS score
  FROM tf, n
)
SELECT doc_id, term, tf, score,
       cast(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS bigint) AS rank
FROM s
QUALIFY rank <= {TFIDF_K}
"""


# --------------------------------------------- functional-dependency check


def q_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FD o_custkey → o_orderstatus over orders: a customer whose orders
    carry more than one status violates (the fixtures mix held and
    violated groups, 8/1492 at sf0.01). One partial-agg groupBy, no
    join, no window."""
    orders = _t(spark, sf_dir, "orders")
    return fd_violations(orders, ["o_custkey"], "o_orderstatus").select(
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        "n_distinct",
        "n_rows",
        "lo_value",
        "hi_value",
    )


SQL_FD_CHECK = """
SELECT cast(o_custkey AS bigint) AS o_custkey,
       cast(count(DISTINCT o_orderstatus) AS bigint) AS n_distinct,
       cast(count(o_orderstatus) AS bigint) AS n_rows,
       min(o_orderstatus) AS lo_value,
       max(o_orderstatus) AS hi_value
FROM orders
GROUP BY 1
HAVING count(DISTINCT o_orderstatus) > 1
"""


ANALYSIS_QUERIES: dict[str, tuple] = {
    "token_chunks": (q_token_chunks, SQL_TOKEN_CHUNKS),
    "group_topk": (q_group_topk, SQL_GROUP_TOPK),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "fd_check": (q_fd_check, SQL_FD_CHECK),
}
