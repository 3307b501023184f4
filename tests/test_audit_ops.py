"""Round-5 audit operators: conversation fingerprints (order
sensitivity, prefix semantics, pure-Python replay), key-skew report
(hand-computed Gini / shares), Benford digits, funnel ordering
adversaries, co-occurrence PMI, and embedding-drift quantization —
hand-computed truths on constructed frames."""

import hashlib
import math

from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.audit import (
    FP_HASH_MOD,
    FP_IDX_MOD,
    FP_TERM_MOD,
    benford_digits,
    conv_fingerprints,
    cooccurrence_pmi,
    key_skew_report,
)


def _h(role: str) -> int:
    """Pure-Python replay of the portable hash chain."""
    return int(hashlib.md5(role.encode()).hexdigest()[:15], 16) % FP_HASH_MOD


def _fp(roles: list[str]) -> tuple[int, int, int]:
    fp = sum((_h(r) * ((i % FP_IDX_MOD) + 1)) % FP_TERM_MOD for i, r in enumerate(roles))
    return fp, sum(_h(r) for r in roles), len(roles)


def _turns(spark, convs: dict[str, list[str]]):
    rows = [
        (cid, i, role) for cid, roles in convs.items() for i, role in enumerate(roles)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")


def test_conv_fingerprint_matches_python_replay(spark):
    convs = {"c1": ["user", "assistant", "tool"], "c2": ["assistant", "user", "tool"]}
    got = {r.conv_id: (r.fp, r.hsum, r.n_turns) for r in conv_fingerprints(_turns(spark, convs)).collect()}
    assert got == {cid: _fp(roles) for cid, roles in convs.items()}


def test_conv_fingerprint_is_order_sensitive(spark):
    """Swapping two different roles changes fp but not hsum — the
    position-weighted sum is order-aware, the checksum order-free."""
    got = {
        r.conv_id: r
        for r in conv_fingerprints(
            _turns(spark, {"a": ["user", "assistant"], "b": ["assistant", "user"]})
        ).collect()
    }
    assert got["a"].fp != got["b"].fp
    assert got["a"].hsum == got["b"].hsum
    assert got["a"].n_turns == got["b"].n_turns


def test_conv_fingerprint_prefix_groups_shared_openings(spark):
    """prefix_len=2: conversations sharing the first two roles
    fingerprint identically however they continue."""
    convs = {
        "a": ["user", "assistant", "tool", "tool"],
        "b": ["user", "assistant", "user", "assistant", "user"],
        "c": ["assistant", "user", "tool"],
    }
    got = {
        r.conv_id: (r.fp, r.hsum, r.n_turns)
        for r in conv_fingerprints(_turns(spark, convs), prefix_len=2).collect()
    }
    assert got["a"] == got["b"] == _fp(["user", "assistant"])
    assert got["c"] == _fp(["assistant", "user"])


def test_key_skew_report_hand_computed(spark):
    """Counts 1,1,2,4 over keys k1..k4: total 8, max_share 0.5,
    Gini = (2·Σrk·cnt − (n+1)·total) / (n·total) with ascending ranks
    (1·1 + 2·1 + 3·2 + 4·4 = 25) ⇒ (50 − 40)/32 = 0.3125."""
    rows = [("k1",)] + [("k2",)] + [("k3",)] * 2 + [("k4",)] * 4
    df = spark.createDataFrame(rows, "k string")
    got = {r.metric: r.value for r in key_skew_report(df, "k").collect()}
    assert got["n_keys"] == 4.0
    assert got["total_rows"] == 8.0
    assert abs(got["max_share"] - 0.5) < 1e-9
    assert abs(got["top10_share"] - 1.0) < 1e-9  # only 4 keys ⇒ top10 = all
    assert abs(got["gini"] - 0.3125) < 1e-9


def test_key_skew_gini_extremes(spark):
    """Uniform counts ⇒ Gini (n−1-biased form) = 0; one key holding
    ~everything pushes it toward 1."""
    uniform = spark.createDataFrame([(f"k{i}",) for i in range(10)], "k string")
    got = {r.metric: r.value for r in key_skew_report(uniform, "k").collect()}
    assert abs(got["gini"]) < 1e-9
    hot = spark.createDataFrame(
        [("hot",)] * 991 + [(f"k{i}",) for i in range(9)], "k string"
    )
    got = {r.metric: r.value for r in key_skew_report(hot, "k").collect()}
    assert got["gini"] > 0.85
    assert abs(got["max_share"] - 0.991) < 1e-9


def test_benford_digits_hand_computed(spark):
    """Digits extract from the leading significant digit across
    magnitudes; frequencies and the log10(1+1/d) expectation line up."""
    vals = [1.0, 12.5, 0.19, 190.0, 2.0, 9000.0, 950.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.digit: r for r in benford_digits(df, "x").collect()}
    assert {d: r.n for d, r in got.items()} == {1: 4, 2: 1, 9: 2}
    assert abs(got[1].freq - round(4 / 7, 6)) < 1e-9
    assert abs(got[1].expected - round(math.log10(2.0), 6)) < 1e-9
    assert abs(got[9].expected - round(math.log10(10 / 9), 6)) < 1e-9
    assert abs(got[2].abs_dev - round(abs(1 / 7 - math.log10(1.5)), 6)) < 2e-6


def test_benford_ignores_nonpositive(spark):
    df = spark.createDataFrame([(0.0,), (-5.0,), (3.0,)], "x double")
    got = benford_digits(df, "x").collect()
    assert len(got) == 1 and got[0].digit == 3 and got[0].n == 1


def test_funnel_requires_stage_order(spark):
    """q_funnel semantics via the driver query on a constructed
    events parquet: a click BEFORE the first view does not convert;
    a purchase before the (ordered) click does not convert."""
    import datetime as dt

    from sgb_data_validator_spark.plans.audit_queries import q_funnel

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, etype, minute):
        return (eid, t0 + dt.timedelta(minutes=minute), uid, etype, 0.0, "{}")

    rows = [
        # u1: view(1) → click(2) → purchase(3): converts fully
        ev(1, 1, "view", 1), ev(2, 1, "click", 2), ev(3, 1, "purchase", 3),
        # u2: click(1) → view(2): click precedes first view ⇒ stage-2 fail
        ev(4, 2, "click", 1), ev(5, 2, "view", 2),
        # u3: view(1) → purchase(2) → click(3): purchase precedes the
        # ordered click ⇒ stage-3 fail, stage-2 converts at minute 3
        ev(6, 3, "view", 1), ev(7, 3, "purchase", 2), ev(8, 3, "click", 3),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    path = "/tmp/audit_funnel_fixture"
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    got = {r.stage: r.users for r in q_funnel(spark, path).collect()}
    assert got == {"1_view": 3, "2_click": 2, "3_purchase": 1}


def test_cooccurrence_pmi_independence_and_affinity(spark):
    """4 convs: x in all 4, y in 2, (x,y) in 2 ⇒ pmi(x,y) = ln(2·4/(4·2)) = 0
    (independence); y and z always together in their 2 convs ⇒
    pmi(y,z) = ln(2·4/(2·2)) = ln 2."""
    convs = {
        "c1": ["x", "y", "z"],
        "c2": ["x", "y", "z", "y"],
        "c3": ["x"],
        "c4": ["x"],
    }
    got = {
        (r.value_a, r.value_b): r
        for r in cooccurrence_pmi(_turns(spark, convs)).collect()
    }
    assert got[("x", "y")].n_both == 2
    assert abs(got[("x", "y")].pmi) < 1e-9
    assert abs(got[("y", "z")].pmi - round(math.log(2.0), 6)) < 1e-6
    # pairs emit once, lexicographically ordered
    assert ("y", "x") not in got and ("z", "y") not in got


def test_embedding_drift_integer_quantization(spark):
    """Means come from exact integer-millionth sums: constructed
    vectors give exactly-representable means on both halves."""
    from sgb_data_validator_spark.plans.audit_queries import q_embedding_drift

    rows = [
        (0, [0.25, -0.5]),  # side A
        (2, [0.75, -0.5]),  # side A
        (1, [0.5, 1.0]),    # side B
        (3, [1.5, 1.0]),    # side B
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = "/tmp/audit_embdrift_fixture"
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    got = {r.dim: r for r in q_embedding_drift(spark, path).collect()}
    assert got[0].mean_a == 0.5 and got[0].mean_b == 1.0 and got[0].shift == 0.5
    assert got[1].mean_a == -0.5 and got[1].mean_b == 1.0 and got[1].shift == 1.5
    assert got[0].na == 2 and got[0].nb == 2
