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


# ----------------------------------------- round-4 additions: properties


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5_000), st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=80, unique_by=lambda t: t[0],
    ),
    k=st.sampled_from([1, 3, 7]),
    n_salts=st.sampled_from([1, 2, 16]),
)
def test_group_topk_exact_for_any_salt_count(spark, rows, k, n_salts):
    """The salted two-phase top-k must equal the single-window form for
    EVERY salt count — the provable-exactness claim (every global top-k
    row is a top-k row of its salt group), explored over random strata
    sizes including sub-k strata and n_salts=1 (degenerate: one phase)."""
    from sgb_data_validator_spark.operators.sampling import group_topk

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted(
        (r["stratum"], r["key"], r["rank"])
        for r in group_topk(df, "doc_id", "lang", k, n_salts=n_salts).collect()
    )
    by_stratum = {}
    for rid, lang in rows:
        by_stratum.setdefault(lang, []).append(
            (py_hash60("topk\x1f%d" % rid), rid)
        )
    exp = []
    for lang, members in by_stratum.items():
        for rank, (_h, rid) in enumerate(sorted(members)[:k], start=1):
            exp.append((lang, rid, rank))
    assert got == sorted(exp)


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab \t", min_size=0, max_size=40),
        min_size=1, max_size=20,
    ),
    window=st.sampled_from([1, 3, 8]),
    stride=st.sampled_from([1, 2, 5, 9]),
)
def test_token_chunks_property(spark, texts, window, stride):
    """Chunk manifest equals the pure-Python sliding-window replay for
    arbitrary whitespace-noisy texts, including stride > window (gaps),
    stride < window (overlap), and all-whitespace docs (dropped)."""
    from sgb_data_validator_spark.operators.packing import token_window_chunks

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["id"], r["chunk_idx"], r["chunk_tokens"], r["chunk_hash"])
        for r in token_window_chunks(df, "doc_id", "text", window, stride).collect()
    )
    exp = []
    for rid, text in rows:
        if text is None or text.strip() == "":
            continue
        words = text.strip().split()
        for idx, start in enumerate(range(0, len(words), stride)):
            chunk = words[start : start + window]
            exp.append((rid, idx, len(chunk), py_hash60(" ".join(chunk))))
    assert got == sorted(exp)


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(st.integers(0, 100_000), min_size=1, max_size=60, unique=True),
    epochs=st.sampled_from([1, 3]),
    n_shards=st.sampled_from([1, 5]),
)
def test_epoch_manifest_property(spark, keys, epochs, n_shards):
    """Manifest equals the pure-Python replay for arbitrary key sets and
    shard counts — pins the hash-salt layout and the within-shard
    ordering contract."""
    from sgb_data_validator_spark.operators.sampling import epoch_shuffle_manifest

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = sorted(
        (r["epoch"], r["shard"], r["pos"], r["key"])
        for r in epoch_shuffle_manifest(df, "doc_id", epochs, n_shards).collect()
    )
    exp = []
    for epoch in range(epochs):
        shards = {}
        for k in keys:
            h = py_hash60("epoch\x1f%d\x1f%d" % (epoch, k))
            shards.setdefault(h % n_shards, []).append((h, k))
        for shard, members in shards.items():
            for pos, (_h, k) in enumerate(sorted(members), start=1):
                exp.append((epoch, shard, pos, k))
    assert got == sorted(exp)


def test_bpe_counter_and_tokenizer_agree(spark):
    """size(tokenize_bpe(t)) == token_count_bpe(t) for adversarial
    shapes (unicode, punctuation runs, long words, empty, whitespace),
    and both match a pure-Python replay of the ceil(len/4) rule."""
    import math
    import re

    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators.textanalysis import (
        TOKEN_PATTERN,
        token_count_bpe,
        tokenize_bpe,
    )

    texts = [
        "hello world",
        "internationalization antidisestablishmentarianism",
        "a b c d",
        "über zürich!!! foo_bar2 x",
        "",
        "   ",
        "https://example.com/p?q=1",
        "word," * 10,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r.i: (r.n, r.toks)
        for r in df.select(
            "i",
            token_count_bpe(F.col("t")).alias("n"),
            tokenize_bpe(F.col("t")).alias("toks"),
        ).collect()
    }
    pat = re.compile(TOKEN_PATTERN)
    for i, t in enumerate(texts):
        pre = pat.findall(t)
        want = sum(math.ceil(len(p) / 4) for p in pre)
        n, toks = got[i]
        assert n == want, (t, n, want)
        assert len(toks) == n, (t, toks, n)
        # slices reassemble the pre-tokens exactly
        assert "".join(toks) == "".join(pre), (t, toks)


def test_pack_sequences_budgets_hold_under_bpe_counts(spark):
    """pack_sequences driven by token_count_bpe: within every bucket,
    each non-final pack's occupied token span is exactly `budget`
    (concat-and-chunk leaves no gaps), offsets are contiguous, and the
    per-doc counts equal the BPE counter's — the manifest a loader
    could execute with a chars-per-token tokenizer."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators.packing import PACK_STRIDE, pack_sequences
    from sgb_data_validator_spark.operators.textanalysis import token_count_bpe

    texts = [
        (i, f"doc {i} " + "lorem ipsum dolor sit amet " * (i % 7 + 1))
        for i in range(200)
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string").select(
        "doc_id", "text", token_count_bpe(F.col("text")).alias("n_bpe")
    )
    want = {r.doc_id: r.n_bpe for r in df.collect()}
    budget = 64
    out = pack_sequences(df, "doc_id", "n_bpe", budget, n_buckets=4).collect()
    assert {r.id for r in out} == {i for i, _ in texts}  # all docs land (n_bpe>0)
    by_bucket = defaultdict(list)
    for r in out:
        assert r.n_tokens == want[r.id]
        by_bucket[r.bucket].append(r)
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: r.begin_offset)
        # contiguous stream: no gaps, no overlaps
        pos = 0
        for r in rows:
            assert r.begin_offset == pos, (bucket, r)
            assert r.pack_id == bucket * PACK_STRIDE + r.begin_offset // budget
            assert r.offset_in_pack == r.begin_offset % budget
            assert r.spans_boundary == (
                (r.begin_offset // budget) != ((r.begin_offset + r.n_tokens - 1) // budget)
            )
            pos += r.n_tokens
        # every pack before the bucket's last is fully occupied
        total = pos
        assert total == sum(want[r.id] for r in rows)
        n_full_packs = total // budget
        assert n_full_packs >= 1  # the fixture overfills several packs


def test_token_window_chunks_with_bpe_tokenizer(spark):
    """token_window_chunks with tokenize_bpe: chunk sizes count in BPE
    units (every chunk ≤ window, strides cover the whole doc) and the
    total coverage at stride == window equals token_count_bpe."""
    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators.packing import token_window_chunks
    from sgb_data_validator_spark.operators.textanalysis import (
        token_count_bpe,
        tokenize_bpe,
    )

    texts = [(1, "internationalization of the antidisestablishmentarianism corpus!"),
             (2, "short"), (3, "   "), (4, None)]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    out = token_window_chunks(
        df, "doc_id", "text", window=3, stride=3, tokenizer=tokenize_bpe
    ).collect()
    want = {
        r.doc_id: r.n
        for r in df.select("doc_id", token_count_bpe(F.col("text")).alias("n")).collect()
    }
    got_totals = {}
    for r in out:
        assert 1 <= r.chunk_tokens <= 3
        got_totals[r.id] = got_totals.get(r.id, 0) + r.chunk_tokens
    # non-overlapping windows partition the token stream exactly
    assert got_totals == {1: want[1], 2: want[2]}  # 3 (whitespace-only) and 4 (null) drop
