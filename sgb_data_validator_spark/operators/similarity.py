"""Approximate-nearest-neighbor search over an embedding column.

No analog exists in the reference (its only similarity op is the fuzzy
DOI string match, transformations.py:561-624 — a top-1-per-group over a
broadcast dim, which IS the shape used here). Two paths:

* brute force — query set × corpus broadcast-nested-loop scoring +
  top-k window. Exact; right answer whenever |queries| is small
  (the common "score this batch against the corpus" shape). The corpus
  side stays partitioned; only the query set broadcasts.
* LSH-bucketed — random-hyperplane sign buckets (see operators.dedup)
  prune the corpus to the query's bucket before exact scoring. The
  scale path when |queries| ~ |corpus|; recall tunable via n_planes /
  multi-probe.

Scores fold left-to-right in double (oracle-reproducible); ranking ties
break on neighbor id so output is fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.dedup import (
    cosine_with_norms,
    dot,
    hyperplane_bucket,
)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos")
    )


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Plan shape: broadcast(queries) nested-loop against the partitioned
    corpus — embarrassingly parallel, no shuffle of the corpus; the only
    shuffle is the (|queries|·|corpus| → |queries|·k) top-k window over
    the scored pairs, keyed by query_id."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            dot(F.col(vec_col), F.col(vec_col)).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        dot(F.col(vec_col), F.col(vec_col)).alias("cn"),
    )
    scored = q.crossJoin(c).where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_with_norms(F.col("qvec"), F.col("cvec"), F.col("qn"), F.col("cn")), 4
        ).alias("cos"),
    )
    return _topk(scored, k)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
) -> DataFrame:
    """Coarse quantization: map every vector to its nearest centroid
    (max rounded cosine, centroid-id tiebreak — rounding + tiebreak keep
    the argmax reproducible across engines/fold orders). Centroids are a
    broadcast dim, so assignment is a broadcast nested-loop over the
    partitioned fact — no shuffle of the vectors."""
    scored = df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias("_v"),
        dot(F.col(vec_col), F.col(vec_col)).alias("_n"),
    ).crossJoin(centroids).select(
        out_id,
        "_v",
        "cid",
        F.round(
            cosine_with_norms(F.col("_v"), F.col("cv"), F.col("_n"), F.col("cn")), 4
        ).alias("_acos"),
    )
    w = Window.partitionBy(out_id).orderBy(F.desc("_acos"), F.asc("cid"))
    return (
        scored.withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") == 1)
        .select(out_id, "_v", "cid")
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cent_mod: int,
    k: int = 5,
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic sample of the corpus
    (every ``cent_mod``-th id) acts as the coarse centroid set; each
    vector is assigned to its nearest centroid cell and queries probe
    only their own cell (nprobe=1). The cell equi-join is a plain hash
    join — like :func:`knn_lsh` this survives |queries| ~ |corpus|, but
    cells adapt to the data distribution where hyperplane buckets are
    data-oblivious. Real IVF trains centroids with k-means; the sampled
    quantizer keeps the operator deterministic for oracle parity and is
    the standard bootstrap when training is out of scope."""
    cent = F.broadcast(
        corpus.where(F.col(id_col) % cent_mod == 0).select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cv"),
            dot(F.col(vec_col), F.col(vec_col)).alias("cn"),
        )
    )
    q = ivf_assign(queries, cent, id_col, vec_col, "query_id").withColumnRenamed("_v", "qvec")
    c = ivf_assign(corpus, cent, id_col, vec_col, "neighbor_id").withColumnRenamed("_v", "cvec")
    scored = (
        q.join(c, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_with_norms(
                    F.col("qvec"),
                    F.col("cvec"),
                    dot(F.col("qvec"), F.col("qvec")),
                    dot(F.col("cvec"), F.col("cvec")),
                ),
                4,
            ).alias("cos"),
        )
    )
    return _topk(scored, k)


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane-sign bucket. Equi-join on bucket ⇒ hash join, no
    broadcast requirement on either side — this is the shape that
    survives |queries| ~ |corpus| at 100 TB."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
        dot(F.col(vec_col), F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
        dot(F.col(vec_col), F.col(vec_col)).alias("cn"),
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_with_norms(F.col("qvec"), F.col("cvec"), F.col("qn"), F.col("cn")), 4
            ).alias("cos"),
        )
    )
    return _topk(scored, k)
