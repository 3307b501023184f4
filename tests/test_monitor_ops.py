"""Round-5 monitoring / structure operators: Wasserstein drift,
rate_pchart, role transitions + Markov surprise, novel entities —
hand-computed truths on constructed frames."""

import math

from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.drift import novel_entities, wasserstein
from sgb_data_validator_spark.operators.stats import rate_pchart
from sgb_data_validator_spark.operators.windows import (
    role_transitions,
    transition_surprise,
)


def _baseline(spark, freqs, dim="ts_hour_bucket"):
    return spark.createDataFrame(
        [(dim, str(v), f) for v, f in freqs.items()],
        "dim string, value string, freq double",
    )


def test_wasserstein_unit_shift(spark):
    """All mass shifted one bucket later ⇒ W1 = 1.0 exactly (the case
    KS underweights: its max single gap here is only 0.5)."""
    # baseline: uniform over buckets 0,1 ; partition: uniform over 1,2
    baseline = _baseline(spark, {0: 0.5, 1: 0.5})
    turns = spark.createDataFrame(
        [("d1", "1"), ("d1", "2")], "part string, v string"
    )
    got = wasserstein(turns, baseline, value_col=F.col("v")).collect()
    assert len(got) == 1
    assert abs(got[0].w1 - 1.0) < 1e-12


def test_wasserstein_zero_on_identical(spark):
    baseline = _baseline(spark, {0: 0.5, 1: 0.5})
    turns = spark.createDataFrame(
        [("d1", "0"), ("d1", "1")], "part string, v string"
    )
    got = wasserstein(turns, baseline, value_col=F.col("v")).collect()
    assert abs(got[0].w1) < 1e-12


def test_rate_pchart_limits_scale_with_n(spark):
    """Pooled rate 0.1 over 10_000 rows; a small day at 3/10 (rate 0.3)
    stays IN control (wide limits at n=10) while a big day at the same
    absolute deviation rate on n=5000 goes OUT — the p-chart property a
    fixed threshold lacks."""
    rows = []
    # big day A: 5000 rows, 650 defects (rate 0.13)
    rows += [("A", i < 650) for i in range(5000)]
    # big day B: 4990 rows, 347 defects (keeps pooled ≈ 0.1)
    rows += [("B", i < 347) for i in range(4990)]
    # small day C: 10 rows, 3 defects (rate 0.3)
    rows += [("C", i < 3) for i in range(10)]
    df = spark.createDataFrame(rows, "part string, bad boolean")
    got = {r.part: r for r in rate_pchart(df, "part", F.col("bad"), k=3.0).collect()}
    pooled = (650 + 347 + 3) / 10000.0
    assert abs(got["A"].pooled_rate - round(pooled, 6)) < 1e-9
    # hand z for A: (0.13 - 0.1) / sqrt(0.1*0.9/5000)
    z_a = (650 / 5000 - pooled) / math.sqrt(pooled * (1 - pooled) / 5000)
    assert abs(got["A"].z - round(z_a, 4)) < 1e-9
    assert got["A"].status == "OUT_OF_CONTROL"
    z_c = (3 / 10 - pooled) / math.sqrt(pooled * (1 - pooled) / 10)
    assert abs(z_c) < 3.0  # the small day is inside its (wide) limits
    assert got["C"].status == "IN_CONTROL"


def _turns(spark, convs):
    rows = [
        (cid, i, role)
        for cid, roles in convs.items()
        for i, role in enumerate(roles)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")


def test_role_transitions_probabilities(spark):
    turns = _turns(
        spark,
        {
            "c1": ["user", "assistant", "user", "assistant"],
            "c2": ["user", "assistant", "tool"],
        },
    )
    got = {
        (r.prev_role, r.role): (r.n, r.p) for r in role_transitions(turns).collect()
    }
    # bigrams: u→a ×3, a→u ×1, a→t ×1
    assert got[("user", "assistant")] == (3, 1.0)
    assert got[("assistant", "user")][0] == 1 and abs(got[("assistant", "user")][1] - 0.5) < 1e-12
    assert got[("assistant", "tool")][0] == 1
    # conditional rows sum to 1 per prev_role
    sums = {}
    for (prev, _), (_, p) in got.items():
        sums[prev] = sums.get(prev, 0.0) + p
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_transition_surprise_flags_unseen_bigram(spark):
    """A conversation containing a bigram the matrix lacks scores near
    −ln(epsilon), dominating every normal conversation."""
    turns = _turns(
        spark,
        {f"c{i}": ["user", "assistant", "user", "assistant"] for i in range(5)},
    )
    weird = _turns(spark, {"cw": ["assistant", "assistant"]})
    matrix = role_transitions(turns)
    scored = {
        r.conv_id: r.surprise
        for r in transition_surprise(
            turns.unionByName(weird), transitions=matrix
        ).collect()
    }
    assert scored["cw"] > 10.0  # -ln(1e-6) ≈ 13.8
    assert all(v < 1.0 for k, v in scored.items() if k != "cw")


def test_transition_surprise_self_matrix(spark):
    """Self-derived matrix: a perfectly regular corpus has uniform
    (low) surprise for every conversation."""
    turns = _turns(
        spark, {f"c{i}": ["user", "assistant", "user"] for i in range(4)}
    )
    got = transition_surprise(turns).collect()
    assert len(got) == 4
    vals = {round(r.surprise, 9) for r in got}
    assert len(vals) == 1  # identical structure ⇒ identical score


def test_novel_entities_first_seen(spark):
    df = spark.createDataFrame(
        [
            ("d1", 1), ("d1", 2),             # both new on d1
            ("d2", 1), ("d2", 3),             # 3 is new, 1 returning
            ("d3", 1), ("d3", 2), ("d3", 3),  # nothing new
        ],
        "part string, uid int",
    )
    got = {r.part: r for r in novel_entities(df, "part", "uid").collect()}
    assert (got["d1"].active, got["d1"].novel) == (2, 2)
    assert (got["d2"].active, got["d2"].novel) == (2, 1)
    assert (got["d3"].active, got["d3"].novel) == (3, 0)
    assert abs(got["d2"].novel_rate - 0.5) < 1e-12


def test_uchart_rate_above_one(spark):
    """Two rules can fire per row ⇒ rate > 1 is legal on a u-chart
    (a p-chart's sqrt(p(1-p)) would go imaginary there)."""
    from sgb_data_validator_spark.operators.stats import uchart_from_counts

    per = spark.createDataFrame(
        [("A", 100, 150), ("B", 100, 140), ("C", 100, 160)],
        "part string, n long, defects long",
    )
    got = {r.part: r for r in uchart_from_counts(per, k=3.0).collect()}
    u_bar = 450 / 300.0
    assert abs(got["A"].u_bar - round(u_bar, 6)) < 1e-9
    z_a = (1.5 - u_bar) / math.sqrt(u_bar / 100)
    assert abs(got["A"].z - round(z_a, 4)) < 1e-9
    assert got["A"].status == "IN_CONTROL"


def test_uchart_flags_broken_partition(spark):
    """The chart is TWO-sided: a day far above the pooled rate flags
    high (z > 3) while days within ±3σ stay in control — note the
    in-control rates are chosen inside the limits (ū ≈ 0.225,
    3σ ≈ 0.045 at n=1000); a 'suspiciously clean' day far below ū
    would flag too, by design."""
    from sgb_data_validator_spark.operators.stats import uchart_from_counts

    per = spark.createDataFrame(
        [("ok1", 1000, 200), ("ok2", 1000, 190), ("ok3", 1000, 230), ("bad", 1000, 280)],
        "part string, n long, defects long",
    )
    got = {r.part: r for r in uchart_from_counts(per).collect()}
    assert {p: r.status for p, r in got.items()} == {
        "ok1": "IN_CONTROL",
        "ok2": "IN_CONTROL",
        "ok3": "IN_CONTROL",
        "bad": "OUT_OF_CONTROL",
    }
    assert got["bad"].z > 3.0


def test_spc_report_from_validation_result(spark, tmp_path):
    """spc_report derives (part, n) from the stats artifact and defects
    from the violations frame — one row per partition, no fact rescan
    (asserted structurally: the report evaluates even after the turns
    frame is gone)."""
    from sgb_data_validator_spark.plans.pipeline import (
        TranscriptTables,
        spc_report,
        validate,
    )
    from sgb_data_validator_spark.sources.generator import (
        FixtureConfig,
        write_fixture_tables,
    )

    d = str(tmp_path / "fx")
    write_fixture_tables(spark, FixtureConfig(n_turns=2000), d)
    t = TranscriptTables(
        turns=spark.read.parquet(f"{d}/turns"),
        conversations=spark.read.parquet(f"{d}/conversations"),
        allowed_tools=spark.read.parquet(f"{d}/allowed_tools"),
        baseline_stats=spark.read.parquet(f"{d}/baseline_stats"),
    )
    res = validate(t)
    rows = spc_report(res).collect()
    parts = {r.part for r in res.verdicts.collect()}
    assert {r.part for r in rows} == parts
    # every partition's n equals the turns count for that partition
    n_truth = {
        r.part: r.n
        for r in t.turns.groupBy("part").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.part: r.n for r in rows} == n_truth
    # statuses are from the enum and at least one day is in control
    statuses = {r.status for r in rows}
    assert statuses <= {"IN_CONTROL", "OUT_OF_CONTROL"}


def test_cusum_catches_persistent_shift_shewhart_misses(spark):
    """The CUSUM motivating case: a rate that steps from the 1% target
    to 1.15% and STAYS there. Each shifted day's binomial z is ~1.5σ —
    below every Shewhart limit (p-chart stays IN_CONTROL throughout) —
    but the excursions accumulate at (z − k) ≈ 1.0/day, so CUSUM
    crosses h=4 on the 4th shifted day. An equal-sized ISOLATED spike
    decays (−k/day against target) and never trips it."""
    from sgb_data_validator_spark.operators.stats import (
        cusum_from_counts,
        pchart_from_counts,
    )

    n = 10_000
    rows = [(f"d{i:02d}", n, 100) for i in range(10)]          # 1% = target
    rows += [(f"d{10 + i:02d}", n, 115) for i in range(8)]     # 1.15% persists
    per = spark.createDataFrame(rows, "part string, n long, defects long")
    cusum = {
        r.part: r
        for r in cusum_from_counts(per, k=0.5, h=4.0, target_rate=0.01).collect()
    }
    pchart = {r.part: r for r in pchart_from_counts(per, k=3.0).collect()}
    # Shewhart never fires: every day within 3σ of the pooled rate
    assert all(r.status == "IN_CONTROL" for r in pchart.values())
    # CUSUM: quiet through the baseline, fires on the 4th shifted day
    # and stays latched through the end of the run
    assert all(cusum[f"d{i:02d}"].status == "STABLE" for i in range(12))
    assert cusum["d13"].status == "SHIFTED"
    assert cusum["d17"].status == "SHIFTED"

    # isolated spike of the same size: accumulates once, then decays
    spike = [(f"d{i:02d}", n, 115 if i == 5 else 100) for i in range(18)]
    per2 = spark.createDataFrame(spike, "part string, n long, defects long")
    got2 = cusum_from_counts(per2, k=0.5, h=4.0, target_rate=0.01).collect()
    assert all(r.status == "STABLE" for r in got2)


def test_cusum_closed_form_matches_recurrence(spark):
    """The two-window prefix-scan form == the textbook recurrence
    C+_i = max(0, C+_{i-1} + z_i - k), C-_i = max(0, C-_{i-1} - z_i - k),
    replayed in pure Python from the same counts."""
    import random

    from sgb_data_validator_spark.operators.stats import cusum_from_counts

    rng = random.Random(7)
    rows = [
        (f"d{i:02d}", 1000 + rng.randrange(9000), None) for i in range(25)
    ]
    rows = [(p, n, rng.randrange(max(1, n // 50))) for p, n, _ in rows]
    per = spark.createDataFrame(rows, "part string, n long, defects long")
    k = 0.5
    got = {r.part: r for r in cusum_from_counts(per, k=k, h=4.0).collect()}

    tot_d = sum(d for _, _, d in rows)
    tot_n = sum(n for _, n, _ in rows)
    pbar = tot_d / tot_n
    cpos = cneg = 0.0
    for p, n, d in sorted(rows):
        z = (d / n - pbar) / math.sqrt(pbar * (1 - pbar) / n)
        cpos = max(0.0, cpos + z - k)
        cneg = max(0.0, cneg - z - k)
        assert abs(got[p].cusum_pos - cpos) < 1e-3, p
        assert abs(got[p].cusum_neg - cneg) < 1e-3, p


def test_latency_profile_exact_percentiles(spark, tmp_path):
    """Constructed 1-conversation day with gaps 10/20/30/40 s ⇒
    p50 = 25, p95 = 38.5 (linear interpolation), max = 40."""
    import datetime as dt

    # import via the registry: driver_queries must initialize first
    # (monitor_queries' module-level SQL twins read EVENT_TYPES from it)
    from sgb_data_validator_spark.plans.driver_queries import QUERIES

    q_latency_profile = QUERIES["latency_profile"][0]

    base = dt.datetime(2024, 1, 5, 12, 0, 0)
    offsets = [0, 10, 30, 60, 100]  # gaps 10, 20, 30, 40
    rows = [
        (i, base + dt.timedelta(seconds=s), 1, "view", 0.0, "{}")
        for i, s in enumerate(offsets)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = q_latency_profile(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert r.part == "2024-01-05" and r.n_gaps == 4
    assert abs(r.p50_s - 25.0) < 1e-9
    assert abs(r.p95_s - 38.5) < 1e-9
    assert abs(r.max_s - 40.0) < 1e-9


# ------------------------------------------------- EWMA chart

def test_ewma_closed_form_matches_recurrence(spark):
    """The rescaled prefix-scan form == the textbook recurrence
    E_i = λ·z_i + (1−λ)·E_{i−1} with time-varying limits
    L·sqrt(λ/(2−λ)·(1−(1−λ)^{2i})), replayed in pure Python from the
    same counts (pooled standardization, the driver-query deployment)."""
    import random

    from sgb_data_validator_spark.operators.stats import ewma_from_counts

    rng = random.Random(11)
    rows = [(f"d{i:02d}", 1000 + rng.randrange(9000), 0) for i in range(25)]
    rows = [(p, n, rng.randrange(max(1, n // 50))) for p, n, _ in rows]
    per = spark.createDataFrame(rows, "part string, n long, defects long")
    lam, L = 0.25, 2.7
    got = {r.part: r for r in ewma_from_counts(per, lam=lam, L=L).collect()}

    pbar = sum(d for *_, d in rows) / sum(n for _, n, _ in rows)
    e = 0.0
    for i, (p, n, d) in enumerate(sorted(rows), start=1):
        z = (d / n - pbar) / math.sqrt(pbar * (1 - pbar) / n)
        e = lam * z + (1 - lam) * e
        ucl = L * math.sqrt(lam / (2 - lam) * (1 - (1 - lam) ** (2 * i)))
        assert abs(got[p].ewma - e) < 1e-3, p
        assert abs(got[p].ucl - ucl) < 1e-3, p
        if abs(abs(e) - ucl) > 1e-6:  # skip knife-edge status flips
            want = "OUT_OF_CONTROL" if abs(e) > ucl else "IN_CONTROL"
            assert got[p].status == want, p


def test_ewma_detects_shift_then_forgets(spark):
    """The EWMA motivating case vs CUSUM: a 1% → 1.2% step (each day's
    z ≈ 2.0σ, below every Shewhart limit) crosses the EWMA limit on
    the 3rd shifted day — and once the rate REVERTS to target, the
    chart returns IN_CONTROL within 4 days (E decays ×(1−λ)/day), the
    geometric forgetting CUSUM's latched SHIFTED state lacks (see
    test_cusum_catches_persistent_shift_shewhart_misses)."""
    from sgb_data_validator_spark.operators.stats import ewma_from_counts

    n = 10_000
    rows = [(f"d{i:02d}", n, 100) for i in range(10)]          # at target
    rows += [(f"d{10 + i:02d}", n, 120) for i in range(8)]     # 1.2% persists
    rows += [(f"d{18 + i:02d}", n, 100) for i in range(6)]     # reverts
    per = spark.createDataFrame(rows, "part string, n long, defects long")
    got = {
        r.part: r.status
        for r in ewma_from_counts(per, lam=0.25, L=2.7, target_rate=0.01).collect()
    }
    assert all(got[f"d{i:02d}"] == "IN_CONTROL" for i in range(10))
    assert got["d11"] == "IN_CONTROL"        # 2nd shifted day: not yet
    assert got["d12"] == "OUT_OF_CONTROL"    # 3rd shifted day: crossed
    assert got["d17"] == "OUT_OF_CONTROL"    # still out at shift end
    assert got["d21"] == "IN_CONTROL"        # forgotten 4 days after reversion
    assert got["d23"] == "IN_CONTROL"


def test_spc_charts_survive_degenerate_series(spark):
    """A perfectly clean corpus (zero defects every day ⇒ sigma = 0)
    must chart as in-control, not crash with DIVIDE_BY_ZERO under the
    session's ANSI mode — the z-standardization is guarded to 0 on a
    degenerate series in all four charts (and their SQL twins)."""
    from sgb_data_validator_spark.operators.stats import (
        cusum_from_counts,
        ewma_from_counts,
        pchart_from_counts,
        uchart_from_counts,
    )

    clean = spark.createDataFrame(
        [("d0", 100, 0), ("d1", 100, 0)], "part string, n long, defects long"
    )
    all_bad = spark.createDataFrame(
        [("d0", 100, 100), ("d1", 100, 100)], "part string, n long, defects long"
    )
    for per in (clean, all_bad):
        assert {r.status for r in pchart_from_counts(per).collect()} == {"IN_CONTROL"}
        assert {r.status for r in cusum_from_counts(per).collect()} == {"STABLE"}
        assert {r.status for r in ewma_from_counts(per).collect()} == {"IN_CONTROL"}
        assert all(r.z == 0.0 for r in pchart_from_counts(per).collect())
    assert {r.status for r in uchart_from_counts(clean).collect()} == {"IN_CONTROL"}
