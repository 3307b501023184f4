"""Unit + property coverage for the round-4c operators: prefix-filter
exact similarity join, incremental new-batch dedup, and the domain-mix
report. Oracle parity is covered by the driver twins; these tests pin
the guarantees the twins can't express — above all the prefix filter's
NO-false-negatives contract against a brute-force all-pairs replay."""

import itertools

import pytest
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.dedup import prefix_filter_pairs


def _gram_set(text: str, n: int) -> set:
    words = text.lower().split()
    return {"\x1f".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _brute_pairs(rows, n, t_bp):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        a, b = _gram_set(ta, n), _gram_set(tb, n)
        if not a or not b:
            continue
        inter = len(a & b)
        union = len(a | b)
        if inter * 10000 >= t_bp * union:
            lo, hi = min(ia, ib), max(ia, ib)
            out[(lo, hi)] = (inter, union)
    return out


# vocabulary small on purpose: forces shared grams between non-dups so
# the filter actually has to discriminate, not just bucket disjoint sets
_WORDS = "red blue green gold iron wood salt rain snow moss".split()


def _corpus(n_docs: int, twin_every: int = 4):
    rows = []
    for i in range(n_docs):
        words = [_WORDS[(i * 7 + j * 3 + j * j) % len(_WORDS)] for j in range(12 + i % 9)]
        rows.append((i, " ".join(words)))
    for i, text in list(rows):
        if i % twin_every == 0:
            rows.append((i + 1000, text + " gold rain"))
    rows.append((5000, ""))      # blank → dropped, must not crash or pair
    rows.append((5001, "red"))   # fewer than n words → no shingles
    return rows


def test_prefix_filter_matches_bruteforce_exactly(spark):
    rows = _corpus(40)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["shared_tokens"], r["union_tokens"])
        for r in prefix_filter_pairs(
            df, "doc_id", "text", threshold_bp=7000, shingle_n=3
        ).collect()
    }
    want = _brute_pairs(rows, 3, 7000)
    assert got == want          # completeness AND precision, counts included
    assert len(want) >= 10      # the fixture actually planted similar pairs


def test_prefix_filter_jaccard_bp_is_floor_division(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f g")], ["doc_id", "text"]
    )
    # 3-gram sets: |A|=4, |B|=5, shared=4 → J = 4/5 → 8000 bp exactly
    rows = prefix_filter_pairs(df, "doc_id", "text", threshold_bp=8000, shingle_n=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["shared_tokens"], r["union_tokens"], r["jaccard_bp"]) == (4, 5, 8000)


def test_prefix_filter_validates_threshold(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for bad in (0, -5, 10001, 0.8, "8000"):
        with pytest.raises(ValueError):
            prefix_filter_pairs(df, "doc_id", "text", threshold_bp=bad)


def test_incremental_dedup_verdicts(spark):
    sf_dir = "/root/testdata/sf0.001"
    from sgb_data_validator_spark.plans.training_queries import (
        INC_NEW_MOD,
        INC_NEW_REM,
        TEXT_TWIN_OFFSET,
        q_incremental_dedup,
    )

    out = q_incremental_dedup(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in out}
    # exactly one verdict per new-batch doc, and only new-batch docs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_natural_new = docs.where(F.col("doc_id") % INC_NEW_MOD == INC_NEW_REM).count()
    n_twins = docs.where(F.col("doc_id") % 13 == 0).count()
    assert len(out) == len(by_id) == n_natural_new + n_twins
    for r in out:
        assert (
            r["doc_id"] >= TEXT_TWIN_OFFSET
            or r["doc_id"] % INC_NEW_MOD == INC_NEW_REM
        )
        if r["verdict"] == "new":
            assert r["matched_base_id"] is None
        else:
            assert r["matched_base_id"] is not None
    # a twin whose parent stayed in base must be flagged — unless the
    # parent is so short that appending 3 words drops the bigram
    # Jaccard below the k=32/r=8 s-curve threshold (~0.84): a g-bigram
    # doc's twin sits at J = g/(g+3), under the curve for g < ~16.
    # Long parents (≥ 30 words → J ≥ 0.91) are squarely above it.
    long_parents = {
        r["doc_id"] + TEXT_TWIN_OFFSET
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words")
        ).collect()
        if r["n_words"] >= 30
    }
    flagged = [
        r
        for r in out
        if r["doc_id"] in long_parents
        and (r["doc_id"] - TEXT_TWIN_OFFSET) % INC_NEW_MOD != INC_NEW_REM
    ]
    assert flagged and all(r["verdict"] in ("exact_dup", "near_dup") for r in flagged)


def test_domain_mix_shares_and_blocklist(spark):
    sf_dir = "/root/testdata/sf0.001"
    from sgb_data_validator_spark.plans.training_queries import q_domain_mix

    rows = q_domain_mix(spark, sf_dir).collect()
    assert {r["domain"] for r in rows} == {"example.com", "example.org", "sample.net"}
    total_bp = sum(r["share_bp"] for r in rows)
    assert 10000 - len(rows) <= total_bp <= 10000  # floor-division slack only
    for r in rows:
        assert r["blocked"] == (r["domain"] == "sample.net")
        assert 1 <= r["n_hosts"] <= 97
