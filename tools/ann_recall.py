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


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(approx: dict, exact: dict, k: int) -> float:
    if not exact:
        return 0.0
    tot = sum(len(approx.get(q, set()) & nbrs) / len(nbrs) for q, nbrs in exact.items())
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

    exact = topk_sets(S.knn_bruteforce(queries, vecs, "vec_id", "v", k=k))
    lsh = topk_sets(S.knn_lsh(queries, vecs, "vec_id", "v", dim=DIM, k=k, n_planes=N_PLANES))
    ivf1 = topk_sets(S.knn_ivf(queries, vecs, "vec_id", "v", cent_mod=CENT_MOD, k=k, nprobe=1))
    ivf2 = topk_sets(S.knn_ivf(queries, vecs, "vec_id", "v", cent_mod=CENT_MOD, k=k, nprobe=2))
    ivf4 = topk_sets(S.knn_ivf(queries, vecs, "vec_id", "v", cent_mod=CENT_MOD, k=k, nprobe=4))

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k": k,
                "n_queries": len(exact),
                "recall_lsh": recall(lsh, exact, k),
                "recall_ivf_nprobe1": recall(ivf1, exact, k),
                "recall_ivf_nprobe2": recall(ivf2, exact, k),
                "recall_ivf_nprobe4": recall(ivf4, exact, k),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
