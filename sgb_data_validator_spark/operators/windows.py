"""Sequence rules over the stable (conv_id, turn_idx) window ordering.

The reference has no window functions (its records are independent), but
the north star's transcript model adds two natural sequence invariants:

* ts monotonicity  — ``ts`` must be non-decreasing along ``turn_idx``
  within a conversation (lag compare).
* turn contiguity  — ``turn_idx`` must be dense 0..n-1 (lag diff == 1,
  first == 0) — SURVEY.md §2.5 W3.

Skew design: a plain ``Window.partitionBy(conv_id)`` puts the Zipf-hot
conversation (~18% of all turns in the fixture) into ONE task — a
serial sort tail that ANTI-scales (measured on 50M rows: 21.8s at
8 cores → 35.0s at 32, because the hot task becomes the critical path
once everything else speeds up). Spark has no skew handling for window
functions, so the skew is split explicitly:

  chunk = turn_idx div CHUNK  →  window partitionBy(conv_id, chunk)

which spreads a 10M-turn conversation over ~300 tasks. Each chunk's
first row needs the previous chunk's LAST row for its lag: that row
(max turn_idx per chunk, found with a cheap partial-combined
max-of-struct aggregation) is duplicated as a CARRY row into the next
chunk (excluded from violation emission). Lag semantics are preserved
EXACTLY — gapped boundaries included. Both rules still share ONE
window pass over the narrow (conv_id, turn_idx, ts, part) projection —
the text payload never enters the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.rules import SEV_WARNING

#: rows per window chunk — bounds any single window task regardless of
#: conversation length
SEQ_CHUNK = 32_768


def sessionize(
    turns: DataFrame,
    gap_us: int,
    chunk: int = SEQ_CHUNK,
) -> DataFrame:
    """Gap-based session assignment: within a conversation (ordered by
    turn_idx), a new session starts whenever the gap to the previous
    turn exceeds ``gap_us`` microseconds; output is (conv_id, turn_idx,
    session_idx) with sessions numbered from 0.

    Skew design mirrors sequence_violations: the lag rides chunked
    (conv_id, turn_idx div chunk) windows with carry rows routed to the
    next chunk that has rows, and the cumulative session counter is a
    chunk-local running sum plus a per-chunk prefix offset computed on
    the TINY per-(conv, chunk) summary frame — the hot conversation
    never serializes into one window task, and no payload column ever
    enters a shuffle."""
    slim = turns.select("conv_id", "turn_idx", "ts")
    chunk_of = F.floor(F.col("turn_idx") / chunk).cast("bigint")
    base = slim.select("*", chunk_of.alias("_chunk"), F.lit(False).alias("_carry"))
    cw = Window.partitionBy("conv_id").orderBy("_chunk")
    carry = (
        slim.groupBy("conv_id", chunk_of.alias("_chunk"))
        .agg(F.max(F.struct("turn_idx", "ts")).alias("_m"))
        .withColumn("_next", F.lead("_chunk").over(cw))
        .where(F.col("_next").isNotNull())
        .select(
            "conv_id",
            F.col("_m.turn_idx").alias("turn_idx"),
            F.col("_m.ts").alias("ts"),
            F.col("_next").alias("_chunk"),
            F.lit(True).alias("_carry"),
        )
    )
    w = Window.partitionBy("conv_id", "_chunk").orderBy("turn_idx")
    flagged = (
        base.unionByName(carry)
        .withColumn("_prev_ts", F.lag("ts").over(w))
        .where(~F.col("_carry"))
        .withColumn(
            "_new_sess",
            (
                F.col("_prev_ts").isNull()
                # cast: unix_micros rejects TIMESTAMP_NTZ inputs; the
                # session timezone is pinned UTC so the cast is lossless
                | (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("_prev_ts").cast("timestamp"))
                    > gap_us
                )
            ).cast("bigint"),
        )
    )
    run = Window.partitionBy("conv_id", "_chunk").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = flagged.withColumn("_local_cum", F.sum("_new_sess").over(run))
    # prefix offsets over the per-chunk totals — one row per (conv, chunk)
    totals = flagged.groupBy("conv_id", "_chunk").agg(F.sum("_new_sess").alias("_tot"))
    off_w = Window.partitionBy("conv_id").orderBy("_chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn("_off", F.coalesce(F.sum("_tot").over(off_w), F.lit(0))).select(
        "conv_id", "_chunk", "_off"
    )
    return (
        local.join(offsets, ["conv_id", "_chunk"])
        .select(
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            (F.col("_local_cum") + F.col("_off") - 1).cast("bigint").alias("session_idx"),
        )
    )


def sequence_violations(
    turns: DataFrame,
    check_monotonic_ts: bool = True,
    check_contiguity: bool = True,
    severity: str = SEV_WARNING,
    chunk: int = SEQ_CHUNK,
    tool_caller_roles: tuple[str, ...] | None = None,
    tool_result_roles: tuple[str, ...] | None = None,
    tool_col: str = "tool",
) -> DataFrame:
    """All sequence rules in one skew-split window pass.

    Besides the two lag rules (ts monotonicity, turn contiguity), the
    pass optionally checks tool-call ADJACENCY PAIRING — the
    transcript-native invariant no row-level or argmin/argmax rule can
    see (pass BOTH role tuples to enable; default OFF keeps recorded
    violation counts and the pruned scan of the classic pass stable):

    * ``tool.dangling_result`` — a ``tool_result_roles`` turn whose
      immediately-preceding turn (by ``turn_idx`` order; the previous
      PRESENT turn when the index is gapped — gaps themselves are
      contiguity's finding) is neither a caller nor another result
      (parallel tool calls legally return consecutive result turns),
      or that opens the conversation. An orphaned tool output means a
      dropped or reordered call turn.
    * ``tool.unanswered_call`` — a ``tool_caller_roles`` turn carrying
      a non-null ``tool_col`` whose NEXT turn is not a result turn, or
      that ends the conversation — an agent that called a tool and
      never saw the answer. (A non-null tool on a non-caller,
      non-result row is tool_role_consistency's finding, not this
      rule's.)

    The lead() the call rule needs is fed by a SECOND carry in the
    opposite direction: each chunk's FIRST row (min-of-struct, again a
    partial-combined aggregation) rides into the PREVIOUS chunk that
    has rows. Carry rows sort strictly outside the real rows of their
    host chunk (their turn_idx comes from an adjacent chunk), so lag
    and lead of every real row are exact and carries never emit.
    Precondition: unique turn_idx per conversation (ties would make
    the window order — and any engine's — nondeterministic); run the
    uniqueness rule first on unvalidated input."""
    pairing = tool_caller_roles is not None and tool_result_roles is not None
    val_cols = ["turn_idx"] + (["ts"] if check_monotonic_ts else []) + ["part"]
    if pairing:
        slim = turns.select(
            "conv_id", *val_cols, F.col("role"), F.col(tool_col).alias("_tool")
        )
        val_cols = val_cols + ["role", "_tool"]
    else:
        slim = turns.select("conv_id", *val_cols)
    chunk_of = F.floor(F.col("turn_idx") / chunk).cast("bigint")
    base = slim.select("*", chunk_of.alias("_chunk"), F.lit(False).alias("_carry"))
    # the LAST row of each chunk (max turn_idx, not just the dense
    # boundary index — exact lag semantics even when the boundary row is
    # missing) rides along as the lead-in of the NEXT CHUNK THAT HAS
    # ROWS — found with lead() over the per-chunk summary frame (one row
    # per (conv, chunk): 10^12 turns / 32768 ≈ 3·10^7 rows, negligible).
    # Routing to chunk+1 unconditionally (the round-1 form) lost the
    # carry whenever a turn_idx gap spanned a whole chunk, silently
    # missing a ts regression across that boundary (ADVICE r1).
    # max-of-struct is a partial-combined aggregation, so the hot
    # conversation costs nothing extra here.
    cw = Window.partitionBy("conv_id").orderBy("_chunk")

    def _boundary(agg_fn, neighbor_fn):
        return (
            slim.groupBy("conv_id", chunk_of.alias("_chunk"))
            .agg(agg_fn(F.struct(*val_cols)).alias("_m"))
            .withColumn("_to", neighbor_fn("_chunk").over(cw))
            .where(F.col("_to").isNotNull())
            .select(
                "conv_id",
                *[F.col(f"_m.{c}").alias(c) for c in val_cols],
                F.col("_to").alias("_chunk"),
                F.lit(True).alias("_carry"),
            )
        )

    carry = _boundary(F.max, F.lead)
    seq = base.unionByName(carry)
    if pairing:
        # the symmetric lead-carry: each chunk's first row into the
        # previous chunk that has rows
        seq = seq.unionByName(_boundary(F.min, F.lag))
    w = Window.partitionBy("conv_id", "_chunk").orderBy("turn_idx")
    seq = seq.withColumn("_prev_idx", F.lag("turn_idx").over(w))
    if check_monotonic_ts:
        seq = seq.withColumn("_prev_ts", F.lag("ts").over(w))
    if pairing:
        seq = seq.withColumn("_prev_role", F.lag("role").over(w)).withColumn(
            "_next_role", F.lead("role").over(w)
        )
    seq = seq.where(~F.col("_carry"))

    slots = []
    if check_monotonic_ts:
        slots.append(
            F.when(
                F.col("_prev_ts").isNotNull() & (F.col("ts") < F.col("_prev_ts")),
                F.struct(
                    F.lit("ts.monotonicity").alias("rule_id"),
                    F.lit("ts").alias("column"),
                    F.col("ts").cast("string").alias("offending_value"),
                ),
            )
        )
    if check_contiguity:
        # identical to the unchunked condition: a chunk-start row whose
        # carry is missing has a null prev, and a missing carry means the
        # boundary turn_idx is absent — a genuine gap
        gap = (
            (F.col("_prev_idx").isNull() & (F.col("turn_idx") != 0))
            | (F.col("_prev_idx").isNotNull() & (F.col("turn_idx") - F.col("_prev_idx") > 1))
        )
        slots.append(
            F.when(
                gap,
                F.struct(
                    F.lit("turn.contiguity").alias("rule_id"),
                    F.lit("turn_idx").alias("column"),
                    F.col("turn_idx").cast("string").alias("offending_value"),
                ),
            )
        )
    if pairing:
        legal_prev = tuple(tool_caller_roles) + tuple(tool_result_roles)
        slots.append(
            F.when(
                F.col("role").isin(*tool_result_roles)
                & (
                    F.col("_prev_role").isNull()
                    | ~F.col("_prev_role").isin(*legal_prev)
                ),
                F.struct(
                    F.lit("tool.dangling_result").alias("rule_id"),
                    F.lit("role").alias("column"),
                    F.substring(
                        F.concat(
                            F.coalesce(F.col("_prev_role"), F.lit("NULL")),
                            F.lit(" -> "),
                            F.col("role"),
                        ),
                        1,
                        80,
                    ).alias("offending_value"),
                ),
            )
        )
        slots.append(
            F.when(
                F.col("_tool").isNotNull()
                & F.col("role").isin(*tool_caller_roles)
                & (
                    F.col("_next_role").isNull()
                    | ~F.col("_next_role").isin(*tool_result_roles)
                ),
                F.struct(
                    F.lit("tool.unanswered_call").alias("rule_id"),
                    F.lit(tool_col).alias("column"),
                    F.substring(F.col("_tool"), 1, 80).alias("offending_value"),
                ),
            )
        )
    exploded = seq.select(
        "conv_id",
        "turn_idx",
        F.col("part").cast("string").alias("part"),
        F.explode(F.array_compact(F.array(*slots))).alias("_v"),
    )
    return exploded.select(
        F.col("_v.rule_id").alias("rule_id"),
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("_v.column").alias("column"),
        F.col("_v.offending_value").alias("offending_value"),
        F.lit(severity).alias("severity"),
        "part",
    )


def opening_role_violations(
    turns: DataFrame,
    opening_roles: tuple[str, ...] = ("system",),
) -> DataFrame:
    """``conv.opening_role`` — a conversation's FIRST turn (minimum
    turn_idx, not literally 0: a missing turn 0 is contiguity's job)
    must carry one of ``opening_roles``. Computed with a map-side
    combined min-of-struct argmin per conv_id — one narrow shuffle of
    (conv_id, small-struct) rows, the hot Zipf conversation costs one
    combiner cell per task, never a window sort; the fact is read
    through a pruned (conv_id, turn_idx, role, part) projection.

    Precondition: ``turn_idx`` is unique per conversation at the
    minimum (true for any row_number-derived or uniqueness-validated
    table). On duplicate minimum turn_idx the min-of-struct argmin
    emits ONE row tie-broken lexicographically by (role, part); a
    min(turn_idx)+join-back formulation (e.g. SQL_ROLE_STRUCTURE's
    oracle twin) emits every tied row — run the uniqueness rule first
    if the input may carry duplicate keys."""
    opening = (
        turns.groupBy("conv_id")
        .agg(F.min(F.struct("turn_idx", "role", "part")).alias("_first"))
        .where(~F.col("_first.role").isin(*opening_roles))
        .select(
            F.lit("conv.opening_role").alias("rule_id"),
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("_first.turn_idx").cast("int").alias("turn_idx"),
            F.lit("role").alias("column"),
            F.substring(F.col("_first.role"), 1, 80).alias("offending_value"),
            F.lit(SEV_WARNING).alias("severity"),
            F.col("_first.part").cast("string").alias("part"),
        )
    )
    return opening


def closing_role_violations(
    turns: DataFrame,
    closing_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """``conv.closing_role`` — the argmax complement of
    :func:`opening_role_violations`: a conversation's LAST turn
    (maximum turn_idx) must carry one of ``closing_roles``. The
    transcript-native "ended cleanly" rule — a conversation whose last
    turn is a dangling user message or an error marks a truncated
    export, a crashed agent, or a dropped final turn, none of which a
    record-at-a-time validator can see.

    Same plan shape as the opening rule: a map-side combined
    max-of-struct argmax per conv_id — one narrow shuffle of
    (conv_id, small-struct) rows, the hot Zipf conversation costs one
    combiner cell per task, never a window sort; the fact is read
    through a pruned (conv_id, turn_idx, role, part) projection.

    Precondition: ``turn_idx`` unique per conversation at the maximum
    (same contract as the opening rule; on a duplicate maximum the
    argmax emits ONE row tie-broken lexicographically MAX by
    (role, part), where a max(turn_idx)+join-back twin emits every
    tied row — run the uniqueness rule first on unvalidated input)."""
    closing = (
        turns.groupBy("conv_id")
        .agg(F.max(F.struct("turn_idx", "role", "part")).alias("_last"))
        .where(~F.col("_last.role").isin(*closing_roles))
        .select(
            F.lit("conv.closing_role").alias("rule_id"),
            F.col("conv_id").cast("string").alias("conv_id"),
            F.col("_last.turn_idx").cast("int").alias("turn_idx"),
            F.lit("role").alias("column"),
            F.substring(F.col("_last.role"), 1, 80).alias("offending_value"),
            F.lit(SEV_WARNING).alias("severity"),
            F.col("_last.part").cast("string").alias("part"),
        )
    )
    return closing


def repeat_text_violations(
    turns: DataFrame,
    text_col: str = "text",
    min_repeats: int = 2,
) -> DataFrame:
    """``conv.repeat_text`` — the stuttering-agent rule: the SAME text
    emitted ``min_repeats`` or more times within one conversation marks
    a looping agent, a retrying client, or a merge that duplicated
    turns. The repeat-transition rule sees consecutive same-ROLE turns;
    this sees repeated CONTENT anywhere in the conversation, which
    role-level rules cannot.

    Scale shape: the text is fingerprinted IN-SCAN (the portable
    md5-prefix hash dedup uses), then ONE narrow map-side-combined
    groupBy(conv_id, fingerprint) of (turn_idx, part) pairs — the text
    payload never enters the shuffle. One violation row per repeated
    GROUP (anchored at its earliest turn via min-of-struct, count in
    offending_value), never per repeated row: a stuck agent's
    million-repeat loop must produce one row, not a million.

    NULL/empty texts are excluded — emptiness is non_empty's job, and
    a conversation of many empty turns is not "stuttering"."""
    from sgb_data_validator_spark.operators.dedup import portable_hash

    t = turns.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    )
    g = (
        t.groupBy(
            "conv_id", portable_hash(F.col(text_col)).alias("__fp")
        )
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(F.struct("turn_idx", "part")).alias("_first"),
        )
        .where(F.col("__cnt") >= min_repeats)
    )
    return g.select(
        F.lit("conv.repeat_text").alias("rule_id"),
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("_first.turn_idx").cast("int").alias("turn_idx"),
        F.lit(text_col).alias("column"),
        F.concat(F.lit("repeated x"), F.col("__cnt").cast("string")).alias(
            "offending_value"
        ),
        F.lit(SEV_WARNING).alias("severity"),
        F.col("_first.part").cast("string").alias("part"),
    )


def role_structure_violations(
    turns: DataFrame,
    opening_roles: tuple[str, ...] = ("system",),
    tool_roles: tuple[str, ...] = ("tool",),
) -> DataFrame:
    """Standalone bundle of both conversation-structure rules:
    ``conv.opening_role`` (see :func:`opening_role_violations`, incl.
    its unique-turn_idx precondition) plus ``tool.role_consistency``
    (a non-null ``tool`` only legal on ``tool_roles`` rows).

    The tool rule IS a row rule and is expressed as one — it delegates
    to the fused single-pass :class:`RowRuleSet` projection (the same
    ``tool_role_consistency`` rule the engine pipeline folds into
    ``transcript_row_rules()``), so this bundle costs the argmin's
    pruned scan plus the row-rule scan it shares with every other row
    rule when used through the pipeline."""
    from sgb_data_validator_spark.operators.rules import (
        RowRuleSet,
        tool_role_consistency,
    )

    stray_tool = RowRuleSet().add(
        tool_role_consistency(tool_roles=tool_roles)
    ).violations(turns)
    return opening_role_violations(turns, opening_roles).unionByName(stray_tool)


def role_transitions(turns: DataFrame, smoothing: float = 0.0) -> DataFrame:
    """Global role-transition (Markov bigram) matrix over the transcript:
    one row per observed (prev_role, role) pair with its count and the
    conditional probability P(role | prev_role). The transcript-native
    structural profile — a healthy agent corpus has a characteristic
    matrix (user→assistant heavy, tool→tool rare), and downstream
    :func:`transition_surprise` scores conversations against it.

    Bigram extraction is an equi-join of the narrow (conv_id, turn_idx,
    role) projection with itself on (conv_id, turn_idx) = (conv_id,
    turn_idx + 1). The join key INCLUDES turn_idx, so the Zipf-hot
    conversation spreads over ~n/parallelism keys instead of landing in
    one window-sort task — bigrams over a skewed corpus without the
    chunked-carry machinery sequence_violations needs (which must see
    GAPS; bigrams by definition only pair adjacent dense indices).

    Precondition: dense contiguous ``turn_idx`` (run the contiguity
    rule first — its violations mark exactly the conversations whose
    bigrams would be incomplete here).

    Plan shape: one shuffle for the self-join keyed by (conv_id,
    turn_idx), one map-side-combined groupBy on (prev_role, role) —
    O(roles²) rows out — and the conditional denominator as an in-plan
    window over that tiny frame. The text payload never enters either
    shuffle."""
    slim = turns.select("conv_id", "turn_idx", "role")
    nxt = slim.select(
        "conv_id",
        (F.col("turn_idx") - 1).alias("turn_idx"),
        F.col("role").alias("next_role"),
    )
    pairs = slim.join(nxt, ["conv_id", "turn_idx"]).select(
        F.col("role").alias("prev_role"), F.col("next_role").alias("role")
    )
    counts = pairs.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).alias("n")
    )
    denom = Window.partitionBy("prev_role")
    return counts.select(
        "prev_role",
        "role",
        "n",
        (
            (F.col("n") + F.lit(smoothing))
            / (F.sum("n").over(denom) + F.lit(smoothing))
        ).alias("p"),
    )


def transition_surprise(
    turns: DataFrame,
    transitions: DataFrame | None = None,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Per-conversation Markov surprise: the mean −ln P(role | prev_role)
    of a conversation's role bigrams under the global (or a supplied
    baseline) transition matrix — conversations whose structure is
    improbable under the corpus's own dynamics score high, catching
    shapes no single row rule sees (an assistant answering itself ten
    times, a tool loop, role-label corruption confined to one
    conversation). Output: (conv_id, n_bigrams, surprise), surprise in
    nats per bigram; rank or threshold downstream.

    ``transitions`` defaults to :func:`role_transitions` over the same
    frame (self-referential scoring — anomalies vs the corpus itself);
    pass a PREVIOUS run's matrix for drift-style scoring of new data
    against history. Transitions absent from the matrix cost
    −ln(epsilon) — a never-before-seen bigram dominates the
    conversation's score, as it should.

    Plan shape: the bigram self-join (keys include turn_idx — skew-safe,
    see :func:`role_transitions`), a BROADCAST join against the
    O(roles²) matrix, and one map-side-combined groupBy(conv_id). Two
    scans of the narrow projection when the matrix is self-derived (one
    to build the matrix, one to score); at 10^12 rows persist the slim
    frame or pass a precomputed matrix to make it one."""
    if transitions is None:
        transitions = role_transitions(turns)
    slim = turns.select("conv_id", "turn_idx", "role")
    nxt = slim.select(
        "conv_id",
        (F.col("turn_idx") - 1).alias("turn_idx"),
        F.col("role").alias("next_role"),
    )
    pairs = slim.join(nxt, ["conv_id", "turn_idx"]).select(
        "conv_id", F.col("role").alias("prev_role"), F.col("next_role").alias("role")
    )
    scored = pairs.join(
        F.broadcast(transitions.select("prev_role", "role", "p")),
        ["prev_role", "role"],
        "left",
    ).withColumn("p", F.coalesce(F.col("p"), F.lit(epsilon)))
    return scored.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(-F.log("p")).alias("surprise"),
    )


def repeat_transition_violations(
    turns: DataFrame,
    rule_id: str = "transition.repeat",
    severity: str = "warning",
) -> DataFrame:
    """Adjacent same-role turns as canonical violation rows — the
    LEGALITY complement of :func:`role_transitions`' distribution view:
    a healthy transcript alternates speakers, so ``user → user`` or
    ``assistant → assistant`` marks a dropped turn, a merge artifact,
    or role-label corruption (the reference flags per-field anomalies
    one record at a time — /root/reference/src/api.py:263
    ``validate_item``; this is the two-row sequence rule a
    record-at-a-time loop cannot express).

    Violations are attributed to the SECOND turn of the pair (the one
    whose presence makes the repeat), with ``offending_value`` =
    ``prev->cur`` so the report reads without a join back.

    Plan shape: the same (conv_id, turn_idx) = (conv_id, turn_idx + 1)
    equi-join as role_transitions — the key includes turn_idx, so the
    Zipf-hot conversation spreads over ~n/parallelism join keys instead
    of one window-sort task; one shuffle, text never enters it.
    Precondition: dense contiguous turn_idx (contiguity rule first)."""
    slim = turns.select("conv_id", "turn_idx", "role")
    nxt = slim.select(
        "conv_id",
        (F.col("turn_idx") - 1).alias("turn_idx"),
        F.col("role").alias("next_role"),
    )
    return (
        slim.join(nxt, ["conv_id", "turn_idx"])
        .where(F.col("role") == F.col("next_role"))
        .select(
            F.lit(rule_id).alias("rule_id"),
            F.col("conv_id").cast("string").alias("conv_id"),
            (F.col("turn_idx") + 1).cast("int").alias("turn_idx"),
            F.lit("role").alias("column"),
            F.concat_ws("->", "role", "next_role").alias("offending_value"),
            F.lit(severity).alias("severity"),
        )
    )
