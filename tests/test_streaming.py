"""Streaming incremental validation: parity with the batch engine on
the same fixture, resume via checkpoint, bounded-state dedup."""

from pyspark.sql import functions as F

from sgb_data_validator_spark.plans.pipeline import transcript_row_rules
from sgb_data_validator_spark.sources.generator import FixtureConfig, generate_turns
from sgb_data_validator_spark.streaming import incremental as si

CFG = FixtureConfig(n_turns=1500)


def _land(spark, tmp_path):
    path = str(tmp_path / "landing")
    generate_turns(spark, CFG).write.parquet(path)
    return path


def test_stream_violations_match_batch(spark, tmp_path):
    landing = _land(spark, tmp_path)
    out, ckpt = str(tmp_path / "viol"), str(tmp_path / "ckpt1")
    q = si.run_available_now(
        si.stream_row_violations(si.stream_turns(spark, landing)), out, ckpt
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    want = transcript_row_rules().violations(spark.read.parquet(landing))
    assert got.count() == want.count()
    assert got.groupBy("rule_id").count().orderBy("rule_id").collect() == \
        want.groupBy("rule_id").count().orderBy("rule_id").collect()
    # resume: nothing new ⇒ second availableNow run appends nothing
    q2 = si.run_available_now(
        si.stream_row_violations(si.stream_turns(spark, landing)), out, ckpt
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == want.count()


def test_stream_windowed_verdicts_match_batch_days(spark, tmp_path):
    landing = _land(spark, tmp_path)
    out, ckpt = str(tmp_path / "verd"), str(tmp_path / "ckpt2")
    q = si.run_available_now(
        si.stream_windowed_verdicts(si.stream_turns(spark, landing)), out, ckpt
    )
    q.awaitTermination(300)
    got = {r.part: (r.error_count, r.status) for r in spark.read.parquet(out).collect()}
    # batch twin: same error definition grouped by day
    turns = spark.read.parquet(landing)
    rs = transcript_row_rules()
    gate = rs.parse_ok(turns)
    err = F.lit(False)
    for r in rs.rules:
        p = F.coalesce(r.predicate(turns), F.lit(False))
        if r.gated:
            p = p & gate
        if r.severity == "error":
            err = err | p
    want = {
        r.part: r.n
        for r in turns.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("part"))
        .agg(F.sum(err.cast("long")).alias("n"))
        .collect()
    }
    # append mode only emits windows the final watermark has passed: the
    # last day's window is still open at end-of-input and is withheld
    # until more data arrives — by design. All CLOSED days must agree.
    last_day = max(want)
    assert last_day not in got
    for part, n in want.items():
        if part == last_day:
            continue
        assert got[part][0] == n, (part, got.get(part), n)
        assert got[part][1] == ("FAILED" if n > 0 else "PASSED")


def test_stateful_sequence_rules_match_batch(spark, tmp_path):
    """applyInPandasWithState sequence rules == the batch chunked-window
    operator on the same input (single availableNow batch)."""
    from sgb_data_validator_spark.operators.windows import sequence_violations

    landing = _land(spark, tmp_path)
    out, ckpt = str(tmp_path / "seq"), str(tmp_path / "ckpt4")
    q = si.run_available_now(
        si.stream_sequence_violations(si.stream_turns(spark, landing)), out, ckpt
    )
    q.awaitTermination(300)
    got = sorted(
        (r.rule_id, r.conv_id, r.turn_idx)
        for r in spark.read.schema(si.SEQ_OUT_SCHEMA).parquet(out).collect()
    )
    want = sorted(
        (r.rule_id, r.conv_id, r.turn_idx)
        for r in sequence_violations(spark.read.parquet(landing)).collect()
    )
    assert got == want and len(got) > 0


def test_stateful_sequence_state_crosses_batches(spark, tmp_path):
    """The per-conversation state must survive micro-batch boundaries: a
    ts rewind whose offending row arrives in a LATER availableNow run is
    still flagged against the previous run's last row."""
    import datetime as dt

    landing = str(tmp_path / "landing2")
    out, ckpt = str(tmp_path / "seq2"), str(tmp_path / "ckpt5")

    def turn(idx, hour):
        return ("cX", idx, "user", "t", None, dt.datetime(2026, 1, 5, hour), "2026-01-05")

    schema = si.TURN_SCHEMA
    spark.createDataFrame([turn(0, 1), turn(1, 5)], schema).write.mode("append").parquet(landing)
    q = si.run_available_now(
        si.stream_sequence_violations(si.stream_turns(spark, landing)), out, ckpt
    )
    q.awaitTermination(300)
    # second batch: idx 2 arrives with ts BEFORE batch 1's last row
    spark.createDataFrame([turn(2, 3)], schema).write.mode("append").parquet(landing)
    q2 = si.run_available_now(
        si.stream_sequence_violations(si.stream_turns(spark, landing)), out, ckpt
    )
    q2.awaitTermination(300)
    got = {(r.rule_id, r.turn_idx)
           for r in spark.read.schema(si.SEQ_OUT_SCHEMA).parquet(out).collect()}
    assert ("ts.monotonicity", 2) in got  # flagged across the batch boundary
    assert ("turn.contiguity", 2) not in got  # idx contiguous via carried state


def test_stateful_sequence_event_time_timeout(spark, tmp_path):
    """With an event-time timeout, a conversation idle past the horizon
    has its state EXPIRED and restarts as a fresh session. Observable
    difference: cA's next turn is idx 1, which is contiguous with its
    old state (0 → 1, no flag) but a bad session start once the state
    is gone (1 ≠ 0 ⇒ contiguity flag). The no-timeout pipeline over the
    IDENTICAL landing must not flag it."""
    import datetime as dt

    landing = str(tmp_path / "landing3")
    schema = si.TURN_SCHEMA
    one_hour_ms = 3_600_000

    def turn(conv, idx, day, hour):
        return (conv, idx, "user", "t", None, dt.datetime(2026, 1, day, hour), f"2026-01-0{day}")

    def drain(tag, timeout_ms):
        q = si.run_available_now(
            si.stream_sequence_violations(
                si.stream_turns(spark, landing),
                timeout_ms=timeout_ms,
                watermark="0 seconds",
            ),
            str(tmp_path / f"out_{tag}"),
            str(tmp_path / f"ckpt_{tag}"),
        )
        q.awaitTermination(300)

    def got(tag):
        return {
            (r.rule_id, r.conv_id, r.turn_idx)
            for r in spark.read.schema(si.SEQ_OUT_SCHEMA)
            .parquet(str(tmp_path / f"out_{tag}"))
            .collect()
        }

    batches = [
        # batch 1: cA and cB both end day 5 01:00
        [turn("cA", 0, 5, 1), turn("cB", 0, 5, 1)],
        # batch 2: only cB advances to day 6 — the watermark moves past
        # cA's (last ts + 1h) timeout, expiring cA's state
        [turn("cB", 1, 6, 1)],
        # batch 3: cA reappears at idx 1, ts after the watermark
        [turn("cA", 1, 6, 2)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).write.mode("append").parquet(landing)
        drain("timeout", one_hour_ms)
        drain("keep", None)

    # timeout path: cA's state expired ⇒ idx 1 is a bad fresh-session start
    assert ("turn.contiguity", "cA", 1) in got("timeout")
    # no-timeout path: state alive ⇒ 0 → 1 is contiguous, nothing flagged
    assert ("turn.contiguity", "cA", 1) not in got("keep")


def test_stream_dedup_bounded_state(spark, tmp_path):
    landing = _land(spark, tmp_path)
    out, ckpt = str(tmp_path / "dedup"), str(tmp_path / "ckpt3")
    q = si.run_available_now(
        si.stream_deduplicated_turns(si.stream_turns(spark, landing)), out, ckpt
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # output has no (conv_id, turn_idx) duplicates
    assert got.groupBy("conv_id", "turn_idx").count().where("count > 1").count() == 0
    # and it kept one row per distinct input key
    assert got.count() == spark.read.parquet(landing).select("conv_id", "turn_idx").distinct().count()


def test_stream_duplicate_violations_across_batches(spark, tmp_path):
    """A1 in the streaming path: a (conv_id, turn_idx) landing once per
    micro-batch yields EXACTLY ONE violation row (the second copy),
    because the first-seen fact is carried as state; a triple inside
    one batch yields two; a unique key yields none."""
    import datetime as dt

    landing = str(tmp_path / "landing_dup")
    out, ckpt = str(tmp_path / "dups"), str(tmp_path / "ckpt_dup")

    def turn(cid, idx, minute):
        return (cid, idx, "user", "t", None, dt.datetime(2026, 1, 5, 1, minute), "2026-01-05")

    schema = si.TURN_SCHEMA
    # batch 1: cA/0 first copy; cB/0 appears THREE times; cC/0 unique
    spark.createDataFrame(
        [turn("cA", 0, 1), turn("cB", 0, 2), turn("cB", 0, 3), turn("cB", 0, 4), turn("cC", 0, 5)],
        schema,
    ).write.mode("append").parquet(landing)
    q = si.run_available_now(
        si.stream_duplicate_violations(si.stream_turns(spark, landing)), out, ckpt
    )
    q.awaitTermination(300)
    # batch 2: cA/0 duplicate lands in a LATER micro-batch
    spark.createDataFrame([turn("cA", 0, 9)], schema).write.mode("append").parquet(landing)
    q2 = si.run_available_now(
        si.stream_duplicate_violations(si.stream_turns(spark, landing)), out, ckpt
    )
    q2.awaitTermination(300)
    got = spark.read.schema(si.DUP_OUT_SCHEMA).parquet(out).collect()
    by_key = {}
    for r in got:
        assert r.rule_id == "unique.turn" and r.severity == "error"
        by_key[(r.conv_id, r.turn_idx)] = by_key.get((r.conv_id, r.turn_idx), 0) + 1
    assert by_key == {("cA", 0): 1, ("cB", 0): 2}


def test_interval_join_production_horizon_drops_late(spark, tmp_path):
    """The stream-stream interval join with a REAL out-of-orderness
    bound (10 minutes, not the parity harness's fixture-wide horizon)
    over multi-micro-batch input: a purchase arriving in a later batch
    with event time beyond the watermark is DROPPED even though the
    batch join predicate matches it — the state-bounding behavior a
    production deployment relies on (state O(rate × horizon)). Guards
    against cargo-culting q_streaming_interval_join's 35-day harness
    horizon into production (plans/analysis_queries.py)."""
    import datetime
    import os

    clicks_dir = str(tmp_path / "clicks")
    pur_dir = str(tmp_path / "purchases")
    os.makedirs(clicks_dir), os.makedirs(pur_dir)
    T = datetime.datetime(2026, 1, 5, 10, 0, 0)

    def m(minutes):
        return T + datetime.timedelta(minutes=minutes)

    schema_c = "click_id bigint, click_ts timestamp, user_id bigint"
    schema_p = "purchase_id bigint, purchase_ts timestamp, p_user_id bigint"
    # batch 0: clicks for users 1 and 2; one on-time purchase (user 1).
    # End-of-batch watermark: 10:10 − 10 min = 09:50 (clicks node 09:50)
    spark.createDataFrame(
        [(100, m(0), 1), (200, m(-65), 2)], schema_c
    ).coalesce(1).write.parquet(f"{clicks_dir}/b1")
    spark.createDataFrame(
        [(500, m(10), 1)], schema_p
    ).coalesce(1).write.parquet(f"{pur_dir}/b1")
    # batch 1: an on-time filler purchase. With watermark 09:50 active,
    # this batch EVICTS click state older than 09:50 − 30 min = 09:20 —
    # i.e. user 2's click at 08:55 (the interval join's state bound:
    # a click can only ever match purchases ≤ 30 min after it)
    spark.createDataFrame(
        [(700, m(20), 1)], schema_p
    ).coalesce(1).write.parquet(f"{pur_dir}/b2")
    # batch 2: the LATE purchase for user 2 — inside user 2's 30-min
    # join window (click at -65, purchase at -60) but far below the
    # watermark: its click state is gone, so no match can be emitted
    spark.createDataFrame(
        [(600, m(-60), 2)], schema_p
    ).coalesce(1).write.parquet(f"{pur_dir}/b3")
    # file-source ordering is by modification time: force b1 < b2 < b3
    now = 1767600000
    for i, sub in enumerate(("b1", "b2", "b3")):
        d = f"{pur_dir}/{sub}"
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now + i * 1000, now + i * 1000))

    clicks = (
        spark.readStream.schema(schema_c)
        .option("recursiveFileLookup", "true")
        .parquet(clicks_dir)
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        spark.readStream.schema(schema_p)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(pur_dir)
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("user_id", "click_id", "purchase_id")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = si.run_available_now(joined, out, ckpt)
    q.awaitTermination(300)
    got = {(r.user_id, r.purchase_id) for r in spark.read.parquet(out).collect()}
    # both on-time purchases attributed; nothing for the late one
    assert got == {(1, 500), (1, 700)}, got
    # the batch join over identical data WOULD emit user 2's match —
    # proving the streaming absence is the watermark drop, not the
    # join predicate
    bc = spark.read.schema(schema_c).option("recursiveFileLookup", "true").parquet(clicks_dir)
    bp = spark.read.schema(schema_p).option("recursiveFileLookup", "true").parquet(pur_dir)
    batch = bc.join(
        bp,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    assert {(r.user_id, r.purchase_id) for r in batch.collect()} == {
        (1, 500), (1, 700), (2, 600),
    }


def test_stream_drift_monitor_matches_batch_js(spark, tmp_path):
    """The streaming drift monitor's per-window JS equals the batch
    js_divergence on the same closed windows, and only the drifted day
    alerts. The last day's window is withheld (append-mode watermark
    contract), mirroring stream_windowed_verdicts."""
    import datetime as dt

    from sgb_data_validator_spark.operators.drift import js_divergence

    # three days: d1/d2 balanced user/assistant, d3 all-assistant
    # (drifted), d4 sentinel rows that close d3's window
    rows = []
    for day, roles in [
        (1, ["user", "assistant"] * 10),
        (2, ["user", "assistant"] * 10),
        (3, ["assistant"] * 20),
        (4, ["user", "assistant"]),  # sentinel: advances the watermark past d3
    ]:
        for i, role in enumerate(roles):
            rows.append(
                (f"c{day}", i, role, "t", None, dt.datetime(2026, 1, day, 12, i), f"2026-01-0{day}")
            )
    landing = str(tmp_path / "landing")
    spark.createDataFrame(rows, si.TURN_SCHEMA).write.parquet(landing)

    baseline = spark.createDataFrame(
        [("role", "user", 0.5), ("role", "assistant", 0.5)],
        "dim string, value string, freq double",
    )
    out, ckpt = str(tmp_path / "alerts"), str(tmp_path / "ckptd")
    q = si.run_drift_monitor(
        si.stream_turns(spark, landing), baseline, out, ckpt,
        dim="role", window="1 day", watermark="2 hours", threshold=0.05,
    )
    q.awaitTermination(300)
    got = {r.part: r.js for r in spark.read.parquet(out).collect()}
    # only the drifted closed day alerts; balanced days are below
    # threshold and day 4 (open window) is withheld
    assert set(got) == {"2026-01-03"}
    # parity: batch js_divergence on the same day
    turns = spark.read.parquet(landing)
    want = {
        r.part: round(r.js, 6)
        for r in js_divergence(turns, baseline, "role").collect()
    }
    assert abs(got["2026-01-03"] - want["2026-01-03"]) < 1e-9
    # resume: re-running with nothing new appends nothing
    q2 = si.run_drift_monitor(
        si.stream_turns(spark, landing), baseline, out, ckpt,
        dim="role", window="1 day", watermark="2 hours", threshold=0.05,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == 1
