"""Deterministic synthetic transcript fixtures (FIXTURES.md).

All generation is **pure column expressions over spark.range** — every
pseudo-random choice is ``xxhash64(keys..., seed)`` so the same config
produces bit-identical tables at any parallelism, any scale, on any
cluster. No driver-side loops, no ``rand()`` (which is
partition-dependent), no external data.

Shape follows BASELINE.json ``input_hint``:
``turns(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` + partition column ``part`` (day bucket).

Skew: conversation lengths follow a Zipf(s≈1.2) law, so conversation 0
holds ~18% of all turns — the "hot conv_id" the north rule requires the
uniqueness aggregation to absorb. Long conversations are exploded in
bounded chunks (CHUNK turns per generated array) so no single task ever
materializes a multi-million-element array.

Dirt classes mirror the reference validator's error/warning classes
one-for-one (see FIXTURES.md table; reference semantics at
/root/reference/src/models.py:22-28, validate.py:430-506,658-684).
Day 0 is kept fully clean and the last day carries a shifted role/tool
mix for the drift checks.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK = 65536  # max turns exploded from one generated array row

ROLES = ["user", "assistant", "system", "tool"]
ALLOWED_TOOLS = ["search", "browser", "python", "calculator", "editor"]

_WORDS = [
    "basel", "stadt", "geschichte", "archive", "record", "turn", "model",
    "answer", "question", "tool", "result", "context", "token", "table",
    "column", "check", "valid", "schema", "source", "media", "item",
    "title", "rights", "license", "creator", "subject", "language",
    "format", "extent", "temporal", "spatial", "public", "private",
    "digital", "object", "metadata", "value", "literal", "uri", "label",
    "the", "and", "with", "from", "über", "für", "nach", "zeit", "bild",
    "text", "karte", "brief", "druck", "foto", "plan", "seite", "band",
    "jahr", "ort", "name", "link", "note", "ref", "id",
]


@dataclass(frozen=True)
class FixtureConfig:
    n_turns: int = 5_000          # approximate target (Zipf rounding)
    days: int = 8                 # number of day-partitions
    seed: int = 42
    dirt: bool = True             # inject dirt classes (day 0 stays clean)
    dirt_permille: int = 15       # per-class dirt rate, ‰ of eligible rows
    n_empty_convs: int = 5        # manifest conversations with zero turns
    base_epoch: str = "2026-01-05 00:00:00"  # UTC day boundary
    zipf_s: float = 1.2

    @property
    def n_convs(self) -> int:
        return max(4, self.n_turns // 20)


def _h(cfg: FixtureConfig, salt: str, *cols) -> F.Column:
    """Deterministic per-row hash in [0, 10000)."""
    return F.pmod(F.xxhash64(F.lit(f"{cfg.seed}:{salt}"), *cols), F.lit(10000))


def _conv_lengths(cfg: FixtureConfig, conv_rank: F.Column) -> F.Column:
    """Zipf(s) turn counts: n_i ≈ N * (i+1)^-s / ζ(s), floor 2."""
    zeta = 5.59  # ζ(1.2), close enough for shape purposes
    raw = F.lit(float(cfg.n_turns)) * F.pow(conv_rank + 1.0, F.lit(-cfg.zipf_s)) / F.lit(zeta)
    return F.greatest(F.lit(2), F.ceil(raw)).cast("int")


def generate_conversations(spark: SparkSession, cfg: FixtureConfig) -> DataFrame:
    """Manifest dim: conv_id, channel, created_ts, is_public, n_turns_expected.

    Includes ``n_empty_convs`` trailing conversations that never appear in
    ``turns`` (reference "no children" warning, validate.py:780-787).
    """
    total = cfg.n_convs + cfg.n_empty_convs
    df = spark.range(total).withColumnRenamed("id", "conv_rank")
    day = F.pmod(F.xxhash64(F.lit(cfg.seed), F.col("conv_rank")), F.lit(cfg.days))
    return df.select(
        F.concat(F.lit("c"), F.col("conv_rank")).alias("conv_id"),
        F.element_at(
            F.array(*[F.lit(c) for c in ("web", "api", "mobile")]),
            (_h(cfg, "channel", F.col("conv_rank")) % 3 + 1).cast("int"),
        ).alias("channel"),
        (F.to_timestamp(F.lit(cfg.base_epoch)) + F.make_interval(days=day.cast("int"))).alias("created_ts"),
        (_h(cfg, "pub", F.col("conv_rank")) % 10 < 8).alias("is_public"),
        F.when(F.col("conv_rank") < cfg.n_convs, _conv_lengths(cfg, F.col("conv_rank")))
        .otherwise(F.lit(0))
        .alias("n_turns_expected"),
    )


def generate_allowed_tools(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(t, t.capitalize()) for t in ALLOWED_TOOLS], "tool string, label string"
    )


def _text_expr(cfg: FixtureConfig, conv: F.Column, idx: F.Column) -> F.Column:
    """5–12 hash-chosen words joined by spaces — pure column math."""
    vocab = F.array(*[F.lit(w) for w in _WORDS])
    n_words = (_h(cfg, "nw", conv, idx) % 8 + 5).cast("int")
    word = lambda i: F.element_at(  # noqa: E731
        vocab, (F.pmod(F.xxhash64(F.lit(cfg.seed), conv, idx, i), F.lit(len(_WORDS))) + 1).cast("int")
    )
    return F.concat_ws(" ", F.transform(F.sequence(F.lit(1), n_words), word))


def generate_turns(spark: SparkSession, cfg: FixtureConfig) -> DataFrame:
    """The fact table. Columns: conv_id, turn_idx, role, text, tool, ts, part."""
    convs = (
        spark.range(cfg.n_convs)
        .withColumnRenamed("id", "conv_rank")
        .withColumn("n_turns", _conv_lengths(cfg, F.col("conv_rank")))
        .withColumn("day", F.pmod(F.xxhash64(F.lit(cfg.seed), F.col("conv_rank")), F.lit(cfg.days)).cast("int"))
    )
    # bounded-chunk explode: no array ever exceeds CHUNK elements, and the
    # chunks of the hot conversation repartition across all tasks.
    chunks = convs.select(
        "conv_rank",
        "n_turns",
        "day",
        F.explode(F.sequence(F.lit(0), ((F.col("n_turns") - 1) / CHUNK).cast("int"))).alias("chunk"),
    ).repartition(spark.sparkContext.defaultParallelism, "conv_rank", "chunk")

    t = chunks.select(
        "conv_rank",
        "n_turns",
        "day",
        F.explode(
            F.sequence(
                F.col("chunk") * CHUNK,
                F.least(F.col("n_turns") - 1, (F.col("chunk") + 1) * F.lit(CHUNK) - 1),
            )
        ).alias("turn_idx"),
    )

    conv = F.col("conv_rank")
    idx = F.col("turn_idx")
    dirty_day = F.col("day") != 0 if cfg.dirt else F.lit(False)
    rate = cfg.dirt_permille  # per 10000 → permille-ish

    def dirt(salt: str) -> F.Column:
        return dirty_day & (_h(cfg, salt, conv, idx) < rate * 10)

    drift_day = (F.col("day") == cfg.days - 1) & F.lit(cfg.dirt)

    # role: turn 0 system, then user/assistant alternating, ~8% tool;
    # drift day: tool share inflated to ~35% (drift.role_kl target).
    tool_cut = F.when(drift_day, 3500).otherwise(800)
    role = (
        F.when(idx == 0, F.lit("system"))
        .when(_h(cfg, "role", conv, idx) < tool_cut, F.lit("tool"))
        .when(idx % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    role = F.when(dirt("role_bad"), F.lit("moderator")).otherwise(role)

    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(x) for x in ALLOWED_TOOLS]),
            (_h(cfg, "tool", conv, idx) % len(ALLOWED_TOOLS) + 1).cast("int"),
        ),
    )
    tool = F.when(dirt("tool_bad"), F.lit("shell")).otherwise(tool)

    text = _text_expr(cfg, conv, idx)
    text = F.when(dirt("url"), F.concat(text, F.lit(" see http://example.com/p?q=1 and www.test.ch/a"))).otherwise(text)
    text = F.when(dirt("nfc"), F.concat(text, F.lit(" zürich ö"))).otherwise(text)
    text = F.when(dirt("ws"), F.concat(F.lit("  "), text, F.lit("​   end "))).otherwise(text)
    text = F.when(dirt("ent"), F.concat(text, F.lit(" &auml;lter &amp; sch&ouml;n"))).otherwise(text)
    text = F.when(dirt("abbr"), F.concat(text, F.lit(" Hans Holbein d.j. und d.ä."))).otherwise(text)
    text = F.when(dirt("empty"), F.lit("   ")).otherwise(text)
    text = F.when(dirt("null"), F.lit(None).cast("string")).otherwise(text)

    # ts: day boundary + turn_idx spread across 86000s of the day (monotone,
    # non-decreasing even for the hot conversation); dirt: one-hour rewind.
    sec = F.floor(idx.cast("double") * 86000.0 / F.col("n_turns").cast("double")).cast("int")
    # drift day: timestamps compressed into 08:00–16:00 ⇒ the hour-of-day
    # histogram shifts hard vs baseline (drift.chi2.ts target)
    sec = F.when(drift_day, (F.lit(28800) + (sec.cast("double") / 86000.0 * 28800.0)).cast("int")).otherwise(sec)
    ts = (
        F.to_timestamp(F.lit(cfg.base_epoch))
        + F.make_interval(days=F.col("day"), secs=sec.cast("double"))
    )
    ts = F.when(dirt("ts"), ts - F.make_interval(hours=F.lit(1))).otherwise(ts)

    conv_id = F.concat(F.lit("c"), conv)
    conv_id = F.when(dirt("orphan"), F.concat(F.lit("orphan_c"), conv)).otherwise(conv_id)

    out = t.select(
        conv_id.alias("conv_id"),
        idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    ).withColumn("part", F.date_format("ts", "yyyy-MM-dd"))

    if cfg.dirt:
        # duplicated (conv_id, turn_idx) members — reference duplicate
        # identifiers check (validate.py:658-684); includes hot-conv rows.
        dups = out.where(
            (F.substring("part", 9, 2) != "05")  # keep day 0 (2026-01-05) clean
            & (F.pmod(F.xxhash64(F.lit(f"{cfg.seed}:dup"), F.col("conv_id"), F.col("turn_idx")), F.lit(10000)) < rate * 10)
        )
        out = out.unionByName(dups)
    return out


def generate_baseline_stats(spark: SparkSession, cfg: FixtureConfig) -> DataFrame:
    """Baseline relative frequencies from a clean, drift-free generation.

    dims: role, tool, ts_hour_bucket. Computed from the same generator with
    dirt off and the drift day excluded — the "profiling snapshot a human
    signed off on" (reference src/profiling.py:57-83 analog).
    """
    clean = generate_turns(spark, replace(cfg, dirt=False))
    clean = clean.where(F.col("part") != clean.agg(F.max("part")).collect()[0][0])
    frames = []
    for dim, col in (("role", F.col("role")), ("tool", F.col("tool")), ("ts_hour_bucket", F.hour("ts").cast("string"))):
        g = clean.where(col.isNotNull()).groupBy(col.alias("value")).count()
        tot = g.agg(F.sum("count")).collect()[0][0]
        frames.append(
            g.select(F.lit(dim).alias("dim"), "value", (F.col("count") / F.lit(float(tot))).alias("freq"))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    # completeness axis: per-column fill rates from the same clean
    # generation, stored in the SAME (dim, value, freq) shape —
    # dim='fill_rate', value=column name, freq=clean fill rate — so the
    # snapshot schema is unchanged and the categorical drift checks
    # (which filter on their own dim) never see these rows
    fill = clean.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count("text").alias("__text"),
        F.count("tool").alias("__tool"),
    ).select(
        F.expr("stack(2, 'text', __text, 'tool', __tool)").alias("value", "__f"),
        F.col("__n"),
    ).select(
        F.lit("fill_rate").alias("dim"),
        "value",
        (F.col("__f") / F.col("__n")).alias("freq"),
    )
    return out.unionByName(fill)


def write_fixture_tables(spark: SparkSession, cfg: FixtureConfig, path: str) -> None:
    """Write the four tables as day-partitioned parquet (Iceberg stand-in:
    this image carries no Iceberg jars; on a real cluster these writes are
    ``writeTo(...).partitionedBy(days(ts))`` against an Iceberg catalog)."""
    generate_turns(spark, cfg).write.mode("overwrite").partitionBy("part").parquet(f"{path}/turns")
    generate_conversations(spark, cfg).write.mode("overwrite").parquet(f"{path}/conversations")
    generate_allowed_tools(spark).write.mode("overwrite").parquet(f"{path}/allowed_tools")
    generate_baseline_stats(spark, cfg).write.mode("overwrite").parquet(f"{path}/baseline_stats")
