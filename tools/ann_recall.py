"""Measured recall of the approximate-NN paths vs exact brute force.

    python tools/ann_recall.py [sf_dir]

For every query vector, compares the approximate top-k neighbor set
(hyperplane-LSH buckets; IVF cells at nprobe 1 and 2) against the exact
brute-force top-k: recall@k = |approx ∩ exact| / k, averaged over
queries. One JSON line out; numbers are recorded in SCALE.md so the
"recall tunable via n_planes / nprobe" claims are measured, not asserted.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topk_sets(df) -> tuple[dict, dict]:
    """(query → neighbor set, query → rank-1 neighbor)."""
    out: dict = {}
    top1: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        if r["rank"] == 1:
            top1[r["query_id"]] = r["neighbor_id"]
    return out, top1


def recall(approx: dict, exact: dict, k: int) -> float:
    """recall@k: per-query overlap normalized by min(k, |exact set|) —
    a query with fewer than k exact neighbors (ties / tiny corpora) can
    still reach 1.0, but never inflates past it."""
    if not exact:
        return 0.0
    tot = sum(
        len(approx.get(q, set()) & nbrs) / min(k, len(nbrs))
        for q, nbrs in exact.items()
        if nbrs
    )
    return round(tot / len(exact), 4)


def main() -> None:
    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators import similarity as S
    from sgb_data_validator_spark.plans.training_queries import (
        DIM,
        KNN_QUERY_MOD,
        N_PLANES,
        _vectors_with_twins,
    )
    from sgb_data_validator_spark.plans.extra_queries import CENT_MOD
    from sgb_data_validator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = 5
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    vecs = _vectors_with_twins(spark, sf_dir).persist()
    queries = vecs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)

    exact, exact1 = topk_sets(S.knn_bruteforce(queries, vecs, "vec_id", "v", k=k))
    lsh, lsh1 = topk_sets(S.knn_lsh(queries, vecs, "vec_id", "v", dim=DIM, k=k, n_planes=N_PLANES))
    ivf1, ivf1_1 = topk_sets(S.knn_ivf(queries, vecs, "vec_id", "v", cent_mod=CENT_MOD, k=k, nprobe=1))
    ivf2, ivf2_1 = topk_sets(S.knn_ivf(queries, vecs, "vec_id", "v", cent_mod=CENT_MOD, k=k, nprobe=2))
    ivf4, ivf4_1 = topk_sets(S.knn_ivf(queries, vecs, "vec_id", "v", cent_mod=CENT_MOD, k=k, nprobe=4))

    # trained quantizer: same bootstrap centroids, Lloyd-iterated to
    # convergence — the before/after pair for kmeans_train's recall claim
    from sgb_data_validator_spark.operators.dedup import dot

    cent0 = vecs.where(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        dot(F.col("v"), F.col("v")).alias("cn"),
    )
    trained = S.kmeans_train(vecs, cent0, "vec_id", "v", max_iter=25, tol=1e-6)
    ivf_t1, ivf_t1_1 = topk_sets(
        S.knn_ivf_with_centroids(queries, vecs, "vec_id", "v", trained, k=k, nprobe=1)
    )
    ivf_t2, ivf_t2_1 = topk_sets(
        S.knn_ivf_with_centroids(queries, vecs, "vec_id", "v", trained, k=k, nprobe=2)
    )

    def top1_recall(approx1: dict) -> float:
        # did the approximate path retrieve the true nearest neighbor
        # (the injected near-twin for twin queries)?
        hit = sum(1 for q, n in exact1.items() if approx1.get(q) == n)
        return round(hit / len(exact1), 4) if exact1 else 0.0

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k": k,
                "n_queries": len(exact),
                "recall_at_k": {
                    "lsh": recall(lsh, exact, k),
                    "ivf_nprobe1": recall(ivf1, exact, k),
                    "ivf_nprobe2": recall(ivf2, exact, k),
                    "ivf_nprobe4": recall(ivf4, exact, k),
                    "ivf_trained_nprobe1": recall(ivf_t1, exact, k),
                    "ivf_trained_nprobe2": recall(ivf_t2, exact, k),
                },
                "top1_recall": {
                    "lsh": top1_recall(lsh1),
                    "ivf_nprobe1": top1_recall(ivf1_1),
                    "ivf_nprobe2": top1_recall(ivf2_1),
                    "ivf_nprobe4": top1_recall(ivf4_1),
                    "ivf_trained_nprobe1": top1_recall(ivf_t1_1),
                    "ivf_trained_nprobe2": top1_recall(ivf_t2_1),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
