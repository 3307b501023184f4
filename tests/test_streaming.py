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
