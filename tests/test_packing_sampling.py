"""Unit + plan tests for sequence packing (operators/packing.py) and
temperature resampling (operators/sampling.py), with pure-Python md5
replays as the oracle — the same portability contract the DuckDB twins
rely on."""

import contextlib
import hashlib
import io
import math

from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.packing import PACK_STRIDE, pack_sequences
from sgb_data_validator_spark.operators.sampling import temperature_sample


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ------------------------------------------------------------- packing

def _py_pack(rows, budget, n_buckets):
    """Pure-Python replay of pack_sequences."""
    out = {}
    buckets = {}
    for rid, toks in rows:
        if toks <= 0:
            continue
        b = py_hash60(str(rid)) % n_buckets
        buckets.setdefault(b, []).append((py_hash60(f"pack\x1f{rid}"), rid, toks))
    for b, docs in buckets.items():
        cum = 0
        for _h, rid, toks in sorted(docs):
            begin = cum
            cum += toks
            out[rid] = {
                "bucket": b,
                "begin_offset": begin,
                "pack_id": b * PACK_STRIDE + begin // budget,
                "offset_in_pack": begin % budget,
                "spans_boundary": begin // budget != (cum - 1) // budget,
            }
    return out


def test_pack_sequences_matches_python_replay(spark):
    rows = [(i, (i * 7) % 13) for i in range(1, 60)]  # includes zero-token docs
    df = spark.createDataFrame(rows, "id long, n long")
    got = {
        r.id: r.asDict()
        for r in pack_sequences(df, "id", "n", budget=10, n_buckets=3).collect()
    }
    want = _py_pack(rows, budget=10, n_buckets=3)
    assert set(got) == set(want)  # zero-token docs dropped
    for rid, exp in want.items():
        for k, v in exp.items():
            assert got[rid][k] == v, (rid, k, got[rid][k], v)


def test_pack_sequences_stream_is_gapless_per_bucket(spark):
    """Concat-and-chunk invariant: within a bucket, documents tile the
    token stream with no gaps or overlaps, and a doc spans a boundary
    iff its token range crosses a multiple of the budget."""
    rows = [(i, 1 + (i % 17)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, n long")
    out = pack_sequences(df, "id", "n", budget=32, n_buckets=4).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for docs in by_bucket.values():
        docs.sort(key=lambda r: r.begin_offset)
        pos = 0
        for r in docs:
            assert r.begin_offset == pos
            assert r.offset_in_pack == pos % 32
            assert r.pack_id % PACK_STRIDE == pos // 32
            pos += r.n_tokens


def test_pack_sequences_single_exchange_on_bucket(spark):
    """Scale shape: ONE hash exchange (on the bucket key) feeding the
    window sort — never a global single-partition sort."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 9 + 1).alias("n")
    )
    plan = plan_of(pack_sequences(df, "id", "n", budget=64, n_buckets=8), "simple")
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(bucket" in plan
    assert "SinglePartition" not in plan


# ------------------------------------------- temperature sampling

def test_temperature_sample_rates_and_membership(spark):
    """α=0.5: stratum keep-rate = floor(10000·sqrt(c_min/c_s));
    membership replays the md5 basis-point rule row by row."""
    rows = (
        [(i, "en") for i in range(400)]
        + [(i + 1000, "de") for i in range(100)]
        + [(i + 2000, "rm") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, "doc_id", "lang", alpha=0.5, keep_rate=True).collect()
    rate = {
        "en": math.floor(round(10000 * math.sqrt(25 / 400), 6)),
        "de": math.floor(round(10000 * math.sqrt(25 / 100), 6)),
        "rm": 10000,
    }
    assert rate == {"en": 2500, "de": 5000, "rm": 10000}
    got = {r.doc_id for r in kept}
    want = {
        rid
        for rid, lang in rows
        if py_hash60(f"{lang}\x1f{rid}") % 10000 < rate[lang]
    }
    assert got == want
    for r in kept:
        assert r["__rate_bp"] == rate[r.lang]
    # smallest stratum kept whole
    assert sum(1 for r in kept if r.lang == "rm") == 25


def test_temperature_sample_alpha_one_keeps_everything(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    assert temperature_sample(df, "doc_id", "lang", alpha=1.0).count() == 90


def test_temperature_sample_rate_join_is_broadcast(spark):
    """The per-stratum rate dim joins back via broadcast — the fact
    rows are never exchanged (only per-stratum count partials)."""
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("string").alias("lang")
    )
    plan = plan_of(temperature_sample(df, "doc_id", "lang"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_rejects_bad_budget_and_buckets(spark):
    import pytest

    from sgb_data_validator_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id int, n int")
    for budget, n_buckets in ((0, 4), (-3, 4), ("256", 4), (2.5, 4), (True, 4),
                              (256, 0), (256, -1), (256, "8")):
        with pytest.raises(ValueError):
            pack_sequences(df, "doc_id", "n", budget, n_buckets)


def test_temperature_and_mix_report_agree_on_null_text(spark, tmp_path):
    """A corpus with null-text/non-null-lang rows: the mix report's
    kept_docs per language must equal the actual temperature_sample
    kept-set sizes — the two queries share one row filter now."""
    from sgb_data_validator_spark.plans.packing_queries import (
        q_mix_report,
        q_temperature_sample,
    )

    rows = [(i, "en" if i % 3 else "de", None if i % 10 == 0 else f"w{i} x y z")
            for i in range(1, 200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    kept = q_temperature_sample(spark, sf).groupBy("lang").count().collect()
    kept_by_lang = {r["lang"]: r["count"] for r in kept}
    report = {r["lang"]: r["kept_docs"] for r in q_mix_report(spark, sf).collect()}
    assert report == kept_by_lang
