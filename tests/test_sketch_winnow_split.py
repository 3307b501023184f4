"""Unit + property coverage for the round-4b operators: count-min
sketch, winnowing fingerprints, token entropy, int8-quantized kNN, and
the leakage-safe split. Oracle parity is covered by the driver twins;
these tests pin the algorithmic guarantees the twins can't express."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- CMS

def test_cms_estimate_never_undercounts(spark):
    from sgb_data_validator_spark.operators.sketch import cms_build, cms_estimate

    toks = spark.createDataFrame(
        [(w,) for w in ("a b c a b a d e f a g b " * 20).split()], ["tok"]
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    sketch = cms_build(toks, "tok", depth=4, width=16)  # narrow → collisions
    est = cms_estimate(exact, sketch, "tok", depth=4, width=16).collect()
    assert len(est) == 7
    by_tok = {r["tok"]: r["est_n"] for r in est}
    for r in exact.collect():
        assert by_tok[r["tok"]] >= r["exact_n"]  # CMS never undercounts


def test_cms_sketch_is_bounded(spark):
    from sgb_data_validator_spark.operators.sketch import cms_build

    toks = spark.createDataFrame([(str(i % 97),) for i in range(2000)], ["tok"])
    sketch = cms_build(toks, "tok", depth=4, width=32)
    rows = sketch.collect()
    assert len(rows) <= 4 * 32
    # every sketch row sums to the full stream length
    per_row = {}
    for r in rows:
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["cell_n"]
    assert set(per_row.values()) == {2000}


def test_cms_exact_when_wide(spark):
    """With width >> distinct keys, collisions are absent in practice
    and the estimate equals the exact count."""
    from sgb_data_validator_spark.operators.sketch import cms_build, cms_estimate

    toks = spark.createDataFrame(
        [(w,) for w in ("x y z x y x " * 10).split()], ["tok"]
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(
        exact, cms_build(toks, "tok", depth=4, width=4096), "tok", depth=4, width=4096
    )
    for r in est.collect():
        assert r["est_n"] == {"x": 30, "y": 20, "z": 10}[r["tok"]]


# ------------------------------------------------------- winnowing

def _winnow(spark, rows, **kw):
    from sgb_data_validator_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return winnow_fingerprints(df, "doc_id", "text", **kw)


def test_winnow_shared_run_guarantee(spark):
    """Docs sharing a run of ≥ w + n − 1 words share ≥ 1 fingerprint
    (the SIGMOD'03 guarantee), even when the surrounding text differs."""
    from sgb_data_validator_spark.operators.dedup import winnow_candidate_pairs

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"alpha beta gamma {shared} delta epsilon zeta"),
        (2, f"one two three four five {shared} six seven eight nine"),
        (3, "completely different content with no overlap at all here today"),
    ]
    fps = _winnow(spark, rows, n=3, w=4)
    pairs = winnow_candidate_pairs(fps, min_shared=1, max_doc_freq=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_winnow_position_aware(spark):
    """A reordered bag of the same words (which fools set-minhash)
    shares no fingerprints when no word run survives."""
    from sgb_data_validator_spark.operators.dedup import winnow_candidate_pairs

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [(1, " ".join(words)), (2, " ".join(reversed(words)))]
    fps = _winnow(spark, rows, n=3, w=4)
    assert winnow_candidate_pairs(fps, min_shared=1, max_doc_freq=10).count() == 0


def test_winnow_density_and_window_count(spark):
    """m-gram docs yield ≤ m − w + 1 selected fingerprints and roughly
    2/(w+1) density on random-ish text."""
    text = " ".join(f"w{(i * 7919) % 501}" for i in range(200))
    fps = _winnow(spark, [(1, text)], n=3, w=4)
    n_sel = fps.count()
    m = 200 - 3 + 1  # gram count
    assert n_sel <= m - 4 + 1
    assert n_sel >= m // 10  # density comfortably above floor


def test_winnow_short_docs_empty(spark):
    fps = _winnow(spark, [(1, "too few words"), (2, "  "), (3, "one")], n=3, w=4)
    # 3 words → 1 gram → no full window of 4 hashes → nothing selected
    assert fps.count() == 0


# --------------------------------------------------- token entropy

def test_token_entropy_values(spark):
    from sgb_data_validator_spark.operators.textanalysis import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # uniform: H = ln 4
            (2, "a a a a"),          # single token: H = 0
            (3, "a a b b"),          # H = ln 2
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert out[1]["norm_entropy"] == pytest.approx(1.0, abs=1e-6)
    assert out[2]["entropy"] == 0.0 and out[2]["norm_entropy"] == 0.0
    assert out[3]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert out[3]["n_tokens"] == 4 and out[3]["n_distinct"] == 2


# -------------------------------------------------------- knn sq8

def test_knn_sq8_finds_scaled_twin(spark):
    """Scaling preserves direction, so a 1.5× twin must be its source's
    top quantized neighbor with qcos ≈ 1 (quantization noise only)."""
    from sgb_data_validator_spark.operators.similarity import knn_sq8

    base = [
        (i, [math.sin(i * 13.7 + j) for j in range(8)]) for i in range(1, 21)
    ]
    twins = [(100 + i, [1.5 * x for x in v]) for i, v in base[:5]]
    df = spark.createDataFrame(base + twins, ["vec_id", "v"])
    out = knn_sq8(df.where(F.col("vec_id") <= 5), df, "vec_id", "v", k=1).collect()
    for r in out:
        assert r["neighbor_id"] == 100 + r["query_id"]
        assert r["qcos"] >= 0.995


def test_sq8_quantization_range(spark):
    from sgb_data_validator_spark.operators.similarity import (
        absmax_params,
        quantize_sq8,
    )

    df = spark.createDataFrame(
        [(i, [float(i), float(-i), 0.0]) for i in range(10)], ["vec_id", "v"]
    )
    params = absmax_params(df, "v")
    q = df.crossJoin(F.broadcast(params)).select(
        quantize_sq8(F.col("v"), F.col("scales")).alias("q")
    )
    for r in q.collect():
        assert all(-127 <= x <= 127 for x in r["q"])
        assert r["q"][2] == 0  # all-zero dimension quantizes to 0


# ---------------------------------------------------------- split

def test_split_assign_duplicates_colocate(spark):
    """Exact and reorder-only duplicates land in the same split — the
    leakage guarantee id-keyed splits violate."""
    from sgb_data_validator_spark.operators.sampling import split_assign

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),        # exact dup
            (3, "mat the on sat cat the"),        # reorder-only dup
            (4, "entirely different document text"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in split_assign(df, "doc_id", "text").collect()}
    assert out[1]["split"] == out[2]["split"] == out[3]["split"]
    assert out[1]["split_bucket"] == out[2]["split_bucket"] == out[3]["split_bucket"]
    assert all(r["split"] in ("train", "val", "test") for r in out.values())


def test_split_assign_proportions(spark):
    from sgb_data_validator_spark.operators.sampling import split_assign

    df = spark.createDataFrame(
        [(i, f"unique document number {i} with distinct words w{i}") for i in range(2000)],
        ["doc_id", "text"],
    )
    counts = dict(
        split_assign(df, "doc_id", "text").groupBy("split").count().rdd
        .map(lambda r: (r["split"], r["count"])).collect()
    )
    assert counts["train"] / 2000 == pytest.approx(0.98, abs=0.02)
    assert counts.get("val", 0) + counts.get("test", 0) == 2000 - counts["train"]


# ------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from sgb_data_validator_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([(f"key{i}",) for i in range(60)], ["fp"])
    bloom = bloom_build(members, "fp", k=3, m=512)
    words = bloom.collect()[0]["words"]
    assert len(words) == 512 // 32
    assert all(0 <= w < (1 << 32) for w in words)  # 32-bit words, no sign games
    probe = spark.createDataFrame([(f"key{i}",) for i in range(200)], ["fp"])
    out = {r["fp"]: r["bloom_hit"] for r in bloom_probe(probe, "fp", bloom, k=3, m=512).collect()}
    # Bloom contract: every member hits
    assert all(out[f"key{i}"] for i in range(60))
    # false positives exist but are a small fraction at this load factor
    fp = sum(out[f"key{i}"] for i in range(60, 200))
    assert fp < 40


def test_bloom_build_validates_geometry(spark):
    from sgb_data_validator_spark.operators.sketch import bloom_build

    df = spark.createDataFrame([("a",)], ["fp"])
    with pytest.raises(ValueError):
        bloom_build(df, "fp", k=3, m=100)  # not a multiple of 32
    with pytest.raises(ValueError):
        bloom_build(df, "fp", k=0, m=512)


def test_streaming_interval_join_matches_batch(spark):
    from pyspark.sql import functions as F
    from sgb_data_validator_spark.plans.analysis_queries import (
        q_streaming_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_attributed"], r["n_purchases"], round(r["sum_value"], 6))
        for r in q_streaming_interval_join(spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("cts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"), "value",
    )
    want_rows = (
        c.join(
            p,
            (F.col("pu") == F.col("user_id"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("pid").alias("np"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv"),
        )
        .collect()
    )
    want = {r["user_id"]: (r["n"], r["np"], round(r["sv"], 6)) for r in want_rows}
    assert got == want  # stream-stream drain reproduces the batch join exactly
