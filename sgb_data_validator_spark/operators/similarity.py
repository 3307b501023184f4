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
    the argmax reproducible across engines/fold orders).

    The centroid set is collapsed to a one-row array and broadcast, and
    the argmax is a per-row ``aggregate`` fold inside a single codegen
    projection — ZERO shuffle of the fact. (The round-1 form took the
    argmax with ``row_number().over(partitionBy(vec_id))``, which
    exchanged |corpus| × |centroids| scored rows — a 4000×-row shuffle
    at 4k centroids; the fold needs none.) Output carries the vector and
    its self-norm so downstream pair scoring never re-folds norms."""
    cid_type = dict(centroids.dtypes)["cid"]
    cent_arr = F.broadcast(
        centroids.agg(
            F.array_sort(F.collect_list(F.struct("cid", "cv", "cn"))).alias("_cents")
        )
    )
    base = df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias("_v"),
        dot(F.col(vec_col), F.col(vec_col)).alias("_n"),
    ).crossJoin(cent_arr)

    def _fold(acc, c):
        score = F.round(cosine_with_norms(F.col("_v"), c["cv"], F.col("_n"), c["cn"]), 4)
        better = (score > acc["s"]) | (
            (score == acc["s"]) & (acc["cid"].isNull() | (c["cid"] < acc["cid"]))
        )
        return F.when(
            better, F.struct(score.alias("s"), c["cid"].alias("cid"))
        ).otherwise(acc)

    init = F.struct(
        F.lit(-2.0).alias("s"), F.lit(None).cast(cid_type).alias("cid")
    )
    return base.select(
        out_id, "_v", "_n", F.aggregate(F.col("_cents"), init, _fold)["cid"].alias("cid")
    )


def ivf_probe_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    nprobe: int,
) -> DataFrame:
    """Top-``nprobe`` cells per vector (the query-side IVF fan-out when
    nprobe > 1 — the standard recall knob: probing more cells recovers
    neighbors that fell just across a cell boundary). Same broadcast
    one-row centroid array as :func:`ivf_assign`; per row the centroid
    scores are sorted natively (rounded-cosine desc, cid-asc tiebreak —
    the same total order the SQL oracle's row_number uses) and the top
    slice explodes to (vector, cell) rows. Still ZERO shuffle of the
    fact; output is nprobe× the query count, which is the intended
    fan-out, not overhead."""
    cid_type = dict(centroids.dtypes)["cid"]
    cent_arr = F.broadcast(
        centroids.agg(
            F.array_sort(F.collect_list(F.struct("cid", "cv", "cn"))).alias("_cents")
        )
    )
    base = df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias("_v"),
        dot(F.col(vec_col), F.col(vec_col)).alias("_n"),
    ).crossJoin(cent_arr)
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.round(
                cosine_with_norms(F.col("_v"), c["cv"], F.col("_n"), c["cn"]), 4
            ).alias("s"),
            c["cid"].cast(cid_type).alias("cid"),
        ),
    )

    def cmp(a, b):
        return (
            F.when(a["s"] > b["s"], F.lit(-1))
            .when(a["s"] < b["s"], F.lit(1))
            .when(a["cid"] < b["cid"], F.lit(-1))
            .when(a["cid"] > b["cid"], F.lit(1))
            .otherwise(F.lit(0))
        )

    top = F.slice(F.array_sort(scored, cmp), 1, nprobe)
    return base.select(
        out_id, "_v", "_n", F.explode(top).alias("_sc")
    ).select(out_id, "_v", "_n", F.col("_sc.cid").alias("cid"))


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cent_mod: int,
    k: int = 5,
    nprobe: int = 1,
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
    cent = corpus.where(F.col(id_col) % cent_mod == 0).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        dot(F.col(vec_col), F.col(vec_col)).alias("cn"),
    )
    return knn_ivf_with_centroids(queries, corpus, id_col, vec_col, cent, k=k, nprobe=nprobe)


def knn_ivf_with_centroids(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """:func:`knn_ivf` with an explicit (cid, cv, cn) centroid frame —
    the entry point for TRAINED quantizers (:func:`kmeans_train`) as
    opposed to the deterministic sampled bootstrap. Same plan shape:
    zero-shuffle broadcast-fold assignment on both sides, cell
    equi-join, top-k window."""
    cent = centroids.select("cid", "cv", "cn")
    q_cells = (
        ivf_assign(queries, cent, id_col, vec_col, "query_id")
        if nprobe <= 1
        else ivf_probe_cells(queries, cent, id_col, vec_col, "query_id", nprobe)
    )
    q = q_cells.withColumnRenamed("_v", "qvec").withColumnRenamed("_n", "qn")
    c = (
        ivf_assign(corpus, cent, id_col, vec_col, "neighbor_id")
        .withColumnRenamed("_v", "cvec")
        .withColumnRenamed("_n", "cn")
    )
    scored = (
        q.join(c, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # norms carried through ivf_assign — no per-pair re-fold
            F.round(
                cosine_with_norms(F.col("qvec"), F.col("cvec"), F.col("qn"), F.col("cn")), 4
            ).alias("cos"),
        )
    )
    return _topk(scored, k)


def kmeans_step(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    mean_precision: int = 6,
) -> DataFrame:
    """One Lloyd k-means iteration over the embedding column — the
    training step that turns :func:`knn_ivf`'s sampled bootstrap
    quantizer into real data-adaptive centroids (iterate to taste, then
    feed the result straight into ivf_assign / knn_ivf's cell join).

    Spark-first shape: assignment is :func:`ivf_assign`'s zero-shuffle
    broadcast fold; the mean recompute is ONE narrow shuffle of
    (cid, pos, val) component rows (posexplode), map-side-combined by
    Spark's partial aggregation — the classic distributed k-means
    pattern, never a collect. Empty cells drop out (standard Lloyd).
    Means are rounded to ``mean_precision`` decimals so the result is
    reproducible across engines and fold orders (same convention as the
    rounded cosines).

    Returns (cid, cv, cn, n_members) — same (cid, cv, cn) contract the
    other IVF operators consume."""
    assigned = ivf_assign(df, centroids, id_col, vec_col, "_vid")
    comps = assigned.select("cid", F.posexplode("_v").alias("pos", "val"))
    means = comps.groupBy("cid", "pos").agg(
        F.round(F.avg("val"), mean_precision).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    rebuilt = means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
        ).alias("cv"),
        F.max("n").cast("bigint").alias("n_members"),
    )
    return rebuilt.select(
        "cid", "cv", dot(F.col("cv"), F.col("cv")).alias("cn"), "n_members"
    )


def kmeans_inertia(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> float:
    """Sum over vectors of (1 - cosine-to-assigned-centroid) — the
    spherical-k-means objective (lower is tighter). One zero-shuffle
    assignment pass + a scalar aggregate; used as the convergence
    metric and by tests asserting Lloyd's monotone descent."""
    assigned = ivf_assign(df, centroids, id_col, vec_col, "_vid")
    c = centroids.select(F.col("cid"), F.col("cv").alias("_cv"), F.col("cn").alias("_cn"))
    scored = assigned.join(F.broadcast(c), "cid").select(
        (1.0 - cosine_with_norms(F.col("_v"), F.col("_cv"), F.col("_n"), F.col("_cn"))).alias("d")
    )
    return float(scored.agg(F.sum("d")).collect()[0][0] or 0.0)


def kmeans_train(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    max_iter: int = 10,
    tol: float = 1e-4,
    mean_precision: int = 6,
) -> DataFrame:
    """Lloyd k-means to convergence: iterate :func:`kmeans_step` until
    the maximum centroid movement (1 - cosine(old, new)) drops below
    ``tol`` — the trained quantizer for :func:`knn_ivf` / semantic
    dedup, vs the single-refinement bootstrap.

    Spark-first loop discipline (same as dedup_clusters): each round is
    one zero-shuffle assignment + one narrow component-mean shuffle;
    ``localCheckpoint`` cuts the lineage so the plan doesn't grow per
    round; the movement test is a scalar agg over the O(k) centroid
    frame (a broadcast-joined old-vs-new cosine), never the fact.
    RAISES if ``max_iter`` trips without convergence rather than
    silently returning a half-trained quantizer. Centroids whose cells
    empty out drop (standard Lloyd), so k may shrink.

    Returns (cid, cv, cn, n_members) like kmeans_step."""
    # cache the working set ONCE: every Lloyd round re-reads the fact
    # for its assignment pass, and at 10^12 rows that is max_iter full
    # scans+decodes of the same (id, vec) projection — the canonical
    # iterate-over-cached-data pattern. Narrow projection first so the
    # cache holds only what the loop touches.
    fact = df.select(F.col(id_col), F.col(vec_col)).persist()
    try:
        cur = centroids.select("cid", "cv", "cn").localCheckpoint()
        for _ in range(max_iter):
            nxt = kmeans_step(fact, cur, id_col, vec_col, mean_precision).localCheckpoint()
            old = cur.select("cid", F.col("cv").alias("_ov"), F.col("cn").alias("_on"))
            movement = (
                nxt.join(old, "cid")
                .select(
                    (1.0 - cosine_with_norms(F.col("cv"), F.col("_ov"), F.col("cn"), F.col("_on"))).alias("mv")
                )
                .agg(F.max("mv"))
                .collect()[0][0]
            )
            cur = nxt
            if movement is not None and movement < tol:
                return cur
    finally:
        # safe: the returned frame is localCheckpointed, independent of
        # the cached lineage
        fact.unpersist()
    raise RuntimeError(
        f"kmeans_train did not converge in {max_iter} iterations "
        f"(last max centroid movement {movement}); raise max_iter or tol"
    )


def kmeans_train_fixed(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    n_iter: int = 3,
    mean_precision: int = 6,
) -> DataFrame:
    """Exactly ``n_iter`` Lloyd rounds, no convergence test — the
    deterministic, SQL-expressible sibling of :func:`kmeans_train`.
    Each round is :func:`kmeans_step`'s rounded arithmetic (4dp
    assignment cosines, ``mean_precision``-dp means), so a chained-CTE
    oracle replays the whole unroll bit-for-bit (the hash-checkable
    driver form; see plans/extra_queries.py SQL_KMEANS_TRAIN_FIXED).
    Use :func:`kmeans_train` when you want convergence semantics and a
    raise on non-convergence.

    Same loop discipline as kmeans_train: the narrow (id, vec)
    projection is cached once and re-read per round; localCheckpoint
    cuts lineage so the plan stays flat; the returned frame is
    checkpointed, so unpersisting the cache is safe."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    fact = df.select(F.col(id_col), F.col(vec_col)).persist()
    try:
        cur = centroids.select("cid", "cv", "cn").localCheckpoint()
        for _ in range(n_iter - 1):
            cur = (
                kmeans_step(fact, cur, id_col, vec_col, mean_precision)
                .select("cid", "cv", "cn")
                .localCheckpoint()
            )
        return kmeans_step(fact, cur, id_col, vec_col, mean_precision).localCheckpoint()
    finally:
        fact.unpersist()


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


# ------------------------------------------------- scalar quantization

def absmax_params(corpus: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension max(|x|) over the corpus as a ONE-ROW frame with
    one aligned array — the symmetric scalar-quantization codebook.
    posexplode → map-side-combined max per dim → fold the ≤ dim rows
    back into an array sorted by dimension index (collect_list is tiny
    and order-fixed by the array_sort on the unique index).

    Symmetric (zero-preserving) quantization is the right codebook for
    dot-product/cosine scoring: it is LINEAR, so directions — and
    therefore cosines — survive quantization up to rounding noise. An
    affine min/max codebook shifts the origin and silently distorts
    every angle."""
    ex = corpus.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
    mm = ex.groupBy("i").agg(F.max(F.abs(F.col("x").cast("double"))).alias("ma"))
    return mm.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "ma"))), lambda s: s["ma"]
        ).alias("scales")
    )


def quantize_sq8(vec: F.Column, scales: F.Column) -> F.Column:
    """Symmetric int8 quantization: q_i = floor(x/absmax·127 + 0.5) ∈
    [−127, 127], 0 where the dimension is all-zero. Pure double
    arithmetic in a fixed expression order, so any IEEE-754 engine
    (the DuckDB oracle included) reproduces it bit-for-bit."""
    return F.zip_with(
        vec,
        scales,
        lambda x, m: F.when(m > 0, F.floor(x.cast("double") / m * 127 + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("bigint"),
    )


def int_dot(a: F.Column, b: F.Column) -> F.Column:
    """Exact int64 dot product of two small-int arrays — order-
    independent (integer addition is associative), so Spark and the
    SQL oracle agree without any rounding grain."""
    return F.aggregate(
        F.zip_with(a, b, lambda u, v: u * v),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def knn_sq8(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors scored in int8-quantized space — the
    memory-bandwidth path: a 100 TB float32 corpus re-scores from a
    4×-smaller int8 representation, and because the quantized dot
    products are exact integers the score is engine-portable with no
    float-summation-order caveat at all (unlike the float paths, the
    round(…, 4) here is cosmetic).

    Plan shape: ONE extra pass over the corpus for the per-dim absmax
    codebook (a one-row frame, broadcast back via crossJoin — the same
    shape temperature_sample uses for its rate table); quantization is
    zip_with codegen inside the scan; scoring is the proven
    broadcast(queries) × partitioned-corpus nested loop + top-k window
    from knn_bruteforce."""
    params = F.broadcast(absmax_params(corpus, vec_col))

    def _q(df: DataFrame, out_id: str) -> DataFrame:
        return df.crossJoin(params).select(
            F.col(id_col).alias(out_id),
            quantize_sq8(F.col(vec_col), F.col("scales")).alias(f"{out_id}_q"),
        )

    q = F.broadcast(
        _q(queries, "query_id").select(
            "query_id", "query_id_q", int_dot("query_id_q", "query_id_q").alias("qn")
        )
    )
    c = _q(corpus, "neighbor_id").select(
        "neighbor_id", "neighbor_id_q", int_dot("neighbor_id_q", "neighbor_id_q").alias("cn")
    )
    scored = (
        q.crossJoin(c)
        .where((F.col("query_id") != F.col("neighbor_id")) & (F.col("qn") > 0) & (F.col("cn") > 0))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                int_dot("query_id_q", "neighbor_id_q").cast("double")
                / F.sqrt((F.col("qn") * F.col("cn")).cast("double")),
                4,
            ).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "qcos")
    )
