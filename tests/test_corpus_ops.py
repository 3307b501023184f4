"""Corpus-statistics operators (plans/corpus_queries.py): goldens for
boilerplate coverage and unigram-NLL, the HLL accuracy contract, and
plan audits for the shuffle shapes the docstrings promise."""

import contextlib
import io
import math

from pyspark.sql import functions as F

from sgb_data_validator_spark.plans.corpus_queries import (
    BOILER_DOC_FREQ,
    HLL_RSD,
    q_boilerplate_ngrams,
    q_perplexity_unigram,
    q_stats_hll,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_word_trigrams_golden(spark):
    from sgb_data_validator_spark.operators.textanalysis import word_trigrams

    df = spark.createDataFrame([("A B c d",), ("x y z",)], ["text"])
    rows = df.select(word_trigrams(F.col("text")).alias("g")).collect()
    assert rows[0].g == ["a b c", "b c d"]
    assert rows[1].g == ["x y z"]


def test_boilerplate_golden(spark, tmp_path):
    # "the quick fox" appears in 3 docs (> BOILER_DOC_FREQ=2) → boiler;
    # every other trigram is unique to its doc
    assert BOILER_DOC_FREQ == 2
    docs = spark.createDataFrame(
        [
            (1, "the quick fox alpha beta gamma", "en", "s", 1),
            (2, "the quick fox delta echo", "en", "s", 1),
            (3, "the quick fox", "en", "s", 1),
            (4, "one two three four", "en", "s", 1),
            (5, "too short", "en", "s", 1),  # < 3 words: excluded
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in q_boilerplate_ngrams(spark, d).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 3: only trigram is the shared one → 100% boilerplate, dropped
    assert out[3].n_grams == 1 and out[3].n_boiler == 1
    assert out[3].boiler_bp == 10_000 and not out[3].keep
    # doc 1: 4 trigrams, 1 shared → 2500 bp, kept
    assert out[1].n_grams == 4 and out[1].n_boiler == 1
    assert out[1].boiler_bp == 2_500 and out[1].keep
    # doc 4: nothing shared
    assert out[4].n_boiler == 0 and out[4].keep


def test_perplexity_unigram_golden(spark, tmp_path):
    # corpus: doc1 = "a a b", doc2 = "b c" → N=5, V=3, denom=8
    # p(a)=3/8? no: add-one on counts c(a)=2,c(b)=2,c(c)=1
    docs = spark.createDataFrame(
        [(1, "a a b", "en", "s", 1), (2, "b c", "en", "s", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in q_perplexity_unigram(spark, d).collect()}
    denom = 5 + 3
    pa, pb, pc = 3 / denom, 3 / denom, 2 / denom
    exp1 = round(-(math.log(pa) + math.log(pa) + math.log(pb)) / 3, 6)
    exp2 = round(-(math.log(pb) + math.log(pc)) / 2, 6)
    assert out[1].n_tokens == 3 and abs(out[1].nll - exp1) < 1e-9
    assert out[2].n_tokens == 2 and abs(out[2].nll - exp2) < 1e-9


def test_stats_hll_accuracy_contract(spark):
    """|HLL estimate − exact| / exact ≤ 3·rsd per group and key —
    the documented accuracy contract for the sketch path."""
    est = {r.part: r for r in q_stats_hll(spark, SF).collect()}
    exact = {
        r.part: r
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy(F.col("l_returnflag").alias("part"))
        .agg(
            F.countDistinct("l_partkey").alias("dp"),
            F.countDistinct("l_suppkey").alias("ds"),
        )
        .collect()
    }
    assert set(est) == set(exact) and est
    for part, r in est.items():
        for got, want in ((r.distinct_parts_est, exact[part].dp), (r.distinct_supps_est, exact[part].ds)):
            assert abs(got - want) / want <= 3 * HLL_RSD, (part, got, want)


def test_boilerplate_plan_no_join(spark):
    """Window-on-gram + reagg-on-doc: exactly two hash exchanges, no
    join, no broadcast — text never enters an exchange."""
    plan = q_boilerplate_ngrams(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Broadcast" not in plan
    hash_exchanges = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert hash_exchanges and all("gram" in l or "doc_id" in l for l in hash_exchanges)
    # the window input carries only (doc_id, gram) — no text column
    assert "text" not in [c.split("#")[0] for l in hash_exchanges for c in l.split("(")[-1].split(",")]


def test_perplexity_plan_fact_never_shuffled_by_token(spark):
    """The token→vocab join must be broadcast (fact side flows through);
    the only hash exchanges carry token-frequency rows (word) or the
    final per-doc re-agg (doc_id)."""
    plan = q_perplexity_unigram(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    hash_exchanges = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert all("word" in l or "doc_id" in l for l in hash_exchanges)


def test_stats_hll_is_single_pass(spark):
    """One scan, one partial+final HLL agg — no extra distinct shuffle
    (the whole point vs exact countDistinct)."""
    plan = q_stats_hll(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Expand" not in plan  # countDistinct would add Expand/extra agg
    hash_exchanges = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert len(hash_exchanges) == 1 and "part" in hash_exchanges[0]
