"""Property-based tests (hypothesis) for the round-5 rule constructors:
whatever bounds/vocabularies/conversations the strategy generates, the
Spark result must equal a pure-Python brute-force replay — the same
invariant the DuckDB twins encode, explored over adversarial inputs
(bounds equal to data points, NULL-heavy columns, single-turn and
all-duplicate conversations)."""

import hashlib

from hypothesis import given, settings, strategies as st

from sgb_data_validator_spark.operators import rules as R
from sgb_data_validator_spark.operators.windows import repeat_text_violations


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(0, 200),
            st.one_of(st.none(), st.integers(-5, 15)),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    lo=st.one_of(st.none(), st.integers(-2, 10)),
    hi=st.one_of(st.none(), st.integers(-2, 10)),
)
def test_in_range_matches_bruteforce(spark, vals, lo, hi):
    if lo is None and hi is None:
        lo = 0
    if lo is not None and hi is not None and lo > hi:
        lo, hi = hi, lo
    df = spark.createDataFrame(vals, "event_id long, value long")
    rs = R.RowRuleSet().add(R.in_range("value", lo=lo, hi=hi))
    got = {
        int(r.conv_id)
        for r in rs.violations(df, key_cols=("event_id",), part_col=None).collect()
    }
    want = {
        rid
        for rid, v in vals
        if v is not None
        and ((lo is not None and v < lo) or (hi is not None and v > hi))
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 200),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    when_vals=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=2, unique=True),
    then_vals=st.one_of(
        st.none(),
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=2, unique=True),
    ),
)
def test_field_pair_matches_bruteforce(spark, rows, when_vals, then_vals):
    df = spark.createDataFrame(rows, "event_id long, a string, b string")
    rs = R.RowRuleSet().add(
        R.field_pair("a", when_vals, "b", then_vals=then_vals)
    )
    got = {
        int(r.conv_id)
        for r in rs.violations(df, key_cols=("event_id",), part_col=None).collect()
    }
    want = set()
    for rid, a, b in rows:
        if a is None or a not in when_vals:
            continue
        bad = b is None  # then_required default True
        if then_vals is not None and b is not None and b not in then_vals:
            bad = True
        if bad:
            want.add(rid)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    convs=st.lists(
        st.tuples(
            st.sampled_from(["c1", "c2", "c3"]),
            st.lists(
                st.one_of(st.none(), st.sampled_from(["", "hello", "again", "ok"])),
                min_size=1,
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    ),
    min_repeats=st.sampled_from([2, 3]),
)
def test_repeat_text_matches_counter_replay(spark, convs, min_repeats):
    rows = [
        (cid, i, text, f"d{i % 2}")
        for cid, texts in convs
        for i, text in enumerate(texts)
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, part string"
    )
    got = {
        (r.conv_id, r.turn_idx): r.offending_value
        for r in repeat_text_violations(t, min_repeats=min_repeats).collect()
    }
    # pure-Python replay: count non-empty texts per (conv, exact text),
    # anchor at the earliest turn
    groups: dict[tuple, list[int]] = {}
    for cid, idx, text, _part in rows:
        if text is None or text.strip() == "":
            continue
        groups.setdefault((cid, text), []).append(idx)
    want = {
        (cid, min(idxs)): f"repeated x{len(idxs)}"
        for (cid, _text), idxs in groups.items()
        if len(idxs) >= min_repeats
    }
    assert got == want
