"""Property-based tests (hypothesis) for the engine-replayable curation
operators: whatever ids/token-counts/strata the strategy generates, the
Spark result must equal the pure-Python md5 replay — the same invariant
the DuckDB twins encode, explored over adversarial inputs (zero tokens,
duplicate-free tiny strata, budgets smaller/larger than any doc)."""

import hashlib
import math

from hypothesis import given, settings, strategies as st

from sgb_data_validator_spark.operators.packing import PACK_STRIDE, pack_sequences
from sgb_data_validator_spark.operators.sampling import temperature_sample


def py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


rows_strategy = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 40)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy, budget=st.sampled_from([1, 7, 64]), n_buckets=st.sampled_from([1, 4]))
def test_pack_sequences_property(spark, rows, budget, n_buckets):
    df = spark.createDataFrame(rows, "id long, n long")
    got = {
        r.id: (r.bucket, r.begin_offset, r.pack_id, r.offset_in_pack, r.spans_boundary)
        for r in pack_sequences(df, "id", "n", budget, n_buckets).collect()
    }
    # pure-Python replay
    buckets = {}
    for rid, toks in rows:
        if toks <= 0:
            continue
        b = py_hash60(str(rid)) % n_buckets
        buckets.setdefault(b, []).append((py_hash60(f"pack\x1f{rid}"), rid, toks))
    want = {}
    for b, docs in buckets.items():
        cum = 0
        for _h, rid, toks in sorted(docs):
            begin, cum = cum, cum + toks
            want[rid] = (
                b,
                begin,
                b * PACK_STRIDE + begin // budget,
                begin % budget,
                begin // budget != (cum - 1) // budget,
            )
    assert got == want


strata_strategy = st.lists(
    st.tuples(st.integers(0, 5_000), st.sampled_from(["en", "de", "fr", "rm"])),
    min_size=1,
    max_size=80,
    unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None)
@given(rows=strata_strategy, alpha=st.sampled_from([0.0, 0.5, 1.0]))
def test_temperature_sample_property(spark, rows, alpha):
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r.doc_id for r in temperature_sample(df, "doc_id", "lang", alpha=alpha).collect()}
    counts = {}
    for _rid, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    cmin = min(counts.values())
    rate = {
        s: math.floor(round(10000 * (cmin / c) ** (1.0 - alpha), 6))
        for s, c in counts.items()
    }
    want = {
        rid for rid, lang in rows if py_hash60(f"{lang}\x1f{rid}") % 10000 < rate[lang]
    }
    assert got == want
    # invariants: a smallest stratum is kept whole; alpha=1 keeps everything
    smallest = min(counts, key=lambda s: (counts[s], s))
    assert {rid for rid, lang in rows if lang == smallest} <= got
    if alpha == 1.0:
        assert got == {rid for rid, _ in rows}
