"""Unit + plan tests for the round-4 analysis tier: token-window
chunking (operators/packing.py:token_window_chunks), per-group
deterministic top-k (operators/sampling.py:group_topk), and the
functional-dependency check (operators/referential.py:fd_violations),
with pure-Python replays as the oracle."""

import contextlib
import hashlib
import io

import pytest
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators.packing import token_window_chunks
from sgb_data_validator_spark.operators.referential import fd_violations
from sgb_data_validator_spark.operators.sampling import group_topk


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------- token chunks


def _py_chunks(rows, window, stride):
    out = []
    for rid, text in rows:
        if text is None or text.strip() == "":
            continue
        words = text.strip().split()
        for idx, start in enumerate(range(0, len(words), stride)):
            chunk = words[start : start + window]
            out.append((rid, idx, len(chunk), py_hash60(" ".join(chunk))))
    return sorted(out)


@pytest.mark.parametrize(
    "window,stride",
    [(4, 3), (4, 4), (3, 5), (1, 1)],  # overlap, exact, gap (stride>window), unit
)
def test_token_chunks_matches_python_replay(spark, window, stride):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "one"),
        (3, "  padded   with   runs  "),
        (4, None),
        (5, "   "),
        (6, " ".join(f"w{i}" for i in range(13))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in token_window_chunks(df, "doc_id", "text", window, stride).collect()
    )
    assert got == _py_chunks(rows, window, stride)


def test_token_chunks_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = plan_of(token_window_chunks(df, "doc_id", "text", 4, 3))
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan.lower()


def test_token_chunks_validates_args(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for bad in (0, -1, True, "4"):
        with pytest.raises(ValueError):
            token_window_chunks(df, "doc_id", "text", bad, 3)
        with pytest.raises(ValueError):
            token_window_chunks(df, "doc_id", "text", 4, bad)


# ----------------------------------------------------------- group topk


def _py_topk(rows, k):
    by_stratum = {}
    for key, stratum in rows:
        by_stratum.setdefault(stratum, []).append(
            (py_hash60(f"topk\x1f{key}"), key)
        )
    out = []
    for stratum, entries in by_stratum.items():
        for rank, (_h, key) in enumerate(sorted(entries)[:k], start=1):
            out.append((stratum, key, rank))
    return sorted(out)


def test_group_topk_matches_python_replay(spark):
    rows = [(i, f"g{i % 4}") for i in range(100)] + [(1000 + i, "hot") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted(
        (r.stratum, r.key, r.rank)
        for r in group_topk(df, "doc_id", "lang", 5).collect()
    )
    assert got == _py_topk(rows, 5)


def test_group_topk_small_groups_and_salt_counts(spark):
    # a stratum smaller than k returns all members, exactly once,
    # regardless of how many salt groups its rows landed in
    rows = [(1, "tiny"), (2, "tiny"), (3, "big"), (4, "big"), (5, "big"), (6, "big")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted(
        (r.stratum, r.key, r.rank)
        for r in group_topk(df, "doc_id", "lang", 3, n_salts=2).collect()
    )
    assert got == _py_topk(rows, 3)


def test_group_topk_validates_k(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        group_topk(df, "doc_id", "lang", 0)


# ------------------------------------------------------------- FD check


def test_fd_violations_emits_only_violators(spark):
    rows = [
        (1, "A"), (1, "A"),          # holds
        (2, "A"), (2, "B"), (2, "C"),  # violates, 3 distinct
        (3, None), (3, "X"),          # null dependent ignored → holds
        (4, None),                    # all-null → count 0 → holds
        (5, "B"), (5, "C"),           # violates, 2 distinct
    ]
    df = spark.createDataFrame(rows, "det long, dep string")
    got = {
        r.det: (r.n_distinct, r.n_rows, r.lo_value, r.hi_value)
        for r in fd_violations(df, ["det"], "dep").collect()
    }
    assert got == {2: (3, 3, "A", "C"), 5: (2, 2, "B", "C")}


def test_fd_violations_two_phase_distinct_agg(spark):
    # Catalyst's count(distinct) expansion: partial agg on (det, dep),
    # exchange, merge on det — exactly two exchanges, no join/window
    df = spark.createDataFrame([(1, "A")], "det long, dep string")
    plan = plan_of(fd_violations(df, ["det"], "dep"), "simple")
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan and "Window" not in plan


# ----------------------------------------------------- gopher flags


def test_gopher_flags_each_rule_fires_independently(spark):
    from sgb_data_validator_spark.operators.textanalysis import gopher_flags

    good = "the quick brown fox and the lazy dog of dover went to town " * 5
    cases = [
        ("good", good, None),                      # passes every rule
        ("short", "the and of to words here", "word_count_ok"),
        ("symbols", ("the and of to " + "!!! ??? ;;; " * 20 + "word " * 40),
         "symbol_ratio_ok"),
        ("nonalpha", ("the and of to " + "123 456 789 " * 30 + "word " * 10),
         "alpha_word_ok"),
        ("nostop", ("zebra quagga okapi lemur " * 20), "stopword_ok"),
    ]
    df = spark.createDataFrame(
        [(n, t) for n, t, _ in cases], ["name", "text"]
    )
    flags = gopher_flags(F.col("text"))
    got = {
        r["name"]: r.asDict()
        for r in df.select("name", *[c.alias(k) for k, c in flags.items()]).collect()
    }
    assert got["good"]["keep"] is True
    for name, _text, broken in cases:
        if broken is None:
            continue
        assert got[name][broken] is False, (name, got[name])
        assert got[name]["keep"] is False


def test_gopher_flags_projection_is_shuffle_free(spark):
    from sgb_data_validator_spark.operators.textanalysis import gopher_flags

    df = spark.createDataFrame([("x y z",)], ["text"])
    flags = gopher_flags(F.col("text"))
    plan = plan_of(df.select(*[c.alias(k) for k, c in flags.items()]))
    assert "Exchange" not in plan


# ----------------------------------------------------- PII redaction


def test_redact_pii_replaces_each_pattern(spark):
    from sgb_data_validator_spark.operators.textanalysis import (
        pii_counts, redact_pii)

    rows = [
        ("mail me at jo.doe+x@example.org today", "<EMAIL>", "email"),
        ("server at 10.0.255.7 is down", "<IPV4>", "ipv4"),
        ("account 123456789 overdrawn", "<ID_NUMBER>", "id_number"),
        ("clean text with no pii at all", None, None),
    ]
    df = spark.createDataFrame([(t,) for t, _, _ in rows], ["text"])
    counts = pii_counts(F.col("text"))
    out = df.select(
        "text",
        redact_pii(F.col("text")).alias("red"),
        *[c.alias(k) for k, c in counts.items()],
    ).collect()
    by_text = {r["text"]: r for r in out}
    for text, placeholder, field in rows:
        r = by_text[text]
        if placeholder is None:
            assert r["red"] == text
            assert r["email"] == r["ipv4"] == r["id_number"] == 0
        else:
            assert placeholder in r["red"], r["red"]
            assert r[field] == 1


def test_redact_pii_placeholder_not_rematched(spark):
    from sgb_data_validator_spark.operators.textanalysis import redact_pii

    # an email whose redaction must not then match ipv4/id_number
    df = spark.createDataFrame([("a 123456789@9.9.9.9.example.com b",)], ["text"])
    red = df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]
    assert red == "a <EMAIL> b"


# ----------------------------------------------- epoch shuffle manifest


def test_epoch_manifest_is_per_epoch_permutation(spark):
    from sgb_data_validator_spark.operators.sampling import epoch_shuffle_manifest

    keys = [(i,) for i in range(200)]
    df = spark.createDataFrame(keys, ["doc_id"])
    m = epoch_shuffle_manifest(df, "doc_id", epochs=3, n_shards=4).collect()
    by_epoch = {}
    for r in m:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {0, 1, 2}
    for rows in by_epoch.values():
        # each key exactly once per epoch
        assert sorted(r["key"] for r in rows) == list(range(200))
        # positions contiguous from 1 within each (epoch, shard)
        shards = {}
        for r in rows:
            shards.setdefault(r["shard"], []).append(r["pos"])
        assert set(shards) <= set(range(4))
        for poss in shards.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
    # epochs are DIFFERENT permutations (overwhelmingly likely by hash)
    order0 = [r["key"] for r in sorted(by_epoch[0], key=lambda r: (r["shard"], r["pos"]))]
    order1 = [r["key"] for r in sorted(by_epoch[1], key=lambda r: (r["shard"], r["pos"]))]
    assert order0 != order1


def test_epoch_manifest_matches_python_replay(spark):
    from sgb_data_validator_spark.operators.sampling import epoch_shuffle_manifest

    keys = list(range(50))
    df = spark.createDataFrame([(k,) for k in keys], ["doc_id"])
    got = sorted(
        (r["epoch"], r["shard"], r["pos"], r["key"])
        for r in epoch_shuffle_manifest(df, "doc_id", 2, 3).collect()
    )
    exp = []
    for epoch in range(2):
        hashed = [
            (py_hash60("epoch\x1f%d\x1f%d" % (epoch, k)), k) for k in keys
        ]
        shards = {}
        for h, k in hashed:
            shards.setdefault(h % 3, []).append((h, k))
        for shard, members in shards.items():
            for pos, (_h, k) in enumerate(sorted(members), start=1):
                exp.append((epoch, shard, pos, k))
    assert got == sorted(exp)


def test_epoch_manifest_validates_args(spark):
    from sgb_data_validator_spark.operators.sampling import epoch_shuffle_manifest

    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError):
        epoch_shuffle_manifest(df, "doc_id", 0, 4)
    with pytest.raises(ValueError):
        epoch_shuffle_manifest(df, "doc_id", 2, 0)
    with pytest.raises(ValueError):
        epoch_shuffle_manifest(df, "doc_id", True, 4)


# ----------------------------------------------- chunk contamination


def test_chunk_carry_cols_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "srcA", "a b c d"), (2, "srcB", "a b c d")],
        ["doc_id", "source", "text"],
    )
    out = token_window_chunks(
        df, "doc_id", "text", 2, 2, carry_cols=("source",)
    ).collect()
    assert {(r["id"], r["source"]) for r in out} == {(1, "srcA"), (2, "srcB")}
    # identical text => identical chunk hashes across sources
    h1 = sorted(r["chunk_hash"] for r in out if r["id"] == 1)
    h2 = sorted(r["chunk_hash"] for r in out if r["id"] == 2)
    assert h1 == h2


# ------------------------------------------------------------ pagerank


def test_pagerank_matches_python_replay(spark):
    from sgb_data_validator_spark.operators.graph import pagerank

    # small directed graph with a dangling node (4 -> nothing)
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["rank"] for r in pagerank(df, 4, 0.85).collect()
    }

    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    n = float(len(nodes))
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(4):
        contrib = {v: 0.0 for v in nodes}
        for s, ds in out.items():
            share = rank[s] / len(ds)
            for d in ds:
                contrib[d] += share
        rank = {v: (1.0 - 0.85) / n + 0.85 * contrib[v] for v in nodes}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-12, (v, got[v], rank[v])


def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    from sgb_data_validator_spark.operators.graph import pagerank

    # symmetrized graph: no dangling mass, ranks must sum to 1
    base = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    edges = base + [(d, s) for s, d in base]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = [r["rank"] for r in pagerank(df, 6).collect()]
    assert abs(sum(ranks) - 1.0) < 1e-9
    assert all(r > 0 for r in ranks)


def test_pagerank_validates_iterations(spark):
    from sgb_data_validator_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(df, 0)
    with pytest.raises(ValueError):
        pagerank(df, True)
