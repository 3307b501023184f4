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
