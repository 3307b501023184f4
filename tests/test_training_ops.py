"""Unit tests for the training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) on tiny inline
frames with hand-computed / pure-Python oracles."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sgb_data_validator_spark.operators import dedup as D
from sgb_data_validator_spark.operators import multimodal as M
from sgb_data_validator_spark.operators import similarity as S
from sgb_data_validator_spark.operators import textanalysis as T


def py_hash60(s: str) -> int:
    """Pure-Python twin of dedup.portable_hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- shingles

def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c b a",), ("solo",)], "text string")
    uni = df.select(D.word_shingles(F.col("text"), 1).alias("s")).collect()
    assert sorted(uni[0].s) == ["a", "b", "c"]
    assert uni[1].s == ["solo"]
    bi = df.select(D.word_shingles(F.col("text"), 2).alias("s")).collect()
    assert sorted(bi[0].s) == ["a\x1fb", "b\x1fa", "b\x1fc", "c\x1fb"]
    assert bi[1].s == []  # too short for bigrams → empty, not an error


def test_portable_hash_matches_python(spark):
    df = spark.createDataFrame([("hello",), ("welt",)], "text string")
    got = {r.text: r.h for r in df.select("text", D.portable_hash(F.col("text")).alias("h")).collect()}
    assert got == {"hello": py_hash60("hello"), "welt": py_hash60("welt")}


# ---------------------------------------------------------------- exact

def test_exact_duplicates_reorder_and_case(spark):
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, "fox THE quick"), (3, "unrelated words here"), (4, "the quick fox")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.exact_duplicates(df, "doc_id", "text").collect()}
    assert set(out) == {"1", "2", "4"}  # doc 3 is not in any dup group
    assert all(r.group_size == 3 and r.keep_id == "1" for r in out.values())
    assert out["1"].is_redundant is False and out["2"].is_redundant is True


# ---------------------------------------------------------------- minhash

def test_minhash_finds_identical_and_skips_disjoint(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    pairs = D.minhash_candidate_pairs(df, "doc_id", "text", k=16, band_rows=2, shingle_n=2).collect()
    assert [(p.id_a, p.id_b, p.n_bands) for p in pairs] == [(1, 2, 8)]


def test_minhash_signature_is_min_over_permutation(spark):
    # signature leg 0 must equal min((a0*h+b0) % p) computed in Python
    words = ["alpha", "beta", "gamma"]
    a0, b0 = D.permutation_coeffs(1)[0]
    expected = min((a0 * (py_hash60(w) % D.MERSENNE_31) + b0) % D.MERSENNE_31 for w in words)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    sig0 = df.select(D.minhash_signature(D.word_shingles(F.col("text")), 1)[0].alias("s")).collect()
    assert sig0[0].s == expected


# ---------------------------------------------------------------- simhash

def test_simhash_identical_zero_distance_near_dup_found(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "utterly different content with other tokens entirely")],
        "doc_id long, text string",
    )
    pairs = D.simhash_near_duplicates(df, "doc_id", "text", max_hamming=3).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_simhash_python_oracle(spark):
    words = "alpha beta gamma delta epsilon".split()
    bigrams = [f"{a}\x1f{b}" for a, b in zip(words, words[1:])]
    sim = 0
    for b in range(D.SIMHASH_BITS):
        s = sum(1 if (py_hash60(g) >> b) & 1 else -1 for g in bigrams)
        if s > 0:
            sim |= 1 << b
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = df.select(D.simhash48(D.word_shingles(F.col("text"), 2)).alias("s")).collect()[0].s
    assert got == sim


# ---------------------------------------------------------------- jaccard

def test_verify_jaccard_exact_value(spark):
    # word sets {a,b,c,d} vs {a,b,c,e}: jaccard = 3/5
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = D.verify_jaccard_pairs(pairs, df, "doc_id", "text", threshold=0.5).collect()
    assert len(out) == 1 and out[0].inter == 3 and out[0].jaccard == 0.6
    # below threshold → filtered
    assert D.verify_jaccard_pairs(pairs, df, "doc_id", "text", threshold=0.7).count() == 0


# ---------------------------------------------------------------- embedding

def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_embedding_near_duplicates_scaled_twin(spark):
    v = [float(i % 7 - 3) for i in range(64)]
    w = [x * 2.0 for x in v]                       # cosine(v, w) = 1.0
    o = [float((i * 31 + 5) % 11 - 5) for i in range(64)]  # unrelated
    df = _vec_df(spark, [(1, v), (2, w), (3, o)])
    out = D.embedding_near_duplicates(df, "vec_id", "v", dim=64, threshold=0.95).collect()
    assert [(r.id_a, r.id_b, r.cos) for r in out] == [(1, 2, 1.0)]


def test_knn_bruteforce_exact_ranks(spark):
    base = [1.0] + [0.0] * 63
    near = [0.9] + [0.1] * 63
    far = [-1.0] + [0.0] * 63
    df = _vec_df(spark, [(0, base), (1, near), (2, far)])
    out = S.knn_bruteforce(df.where("vec_id = 0"), df, "vec_id", "v", k=2).collect()
    assert [(r.query_id, r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        (0, 1, 1),
        (0, 2, 2),
    ]


def test_knn_lsh_same_bucket_recalls_twin(spark):
    v = [float(i % 5 - 2) for i in range(64)]
    twin = [x * 3.0 for x in v]  # same hyperplane signs → same bucket
    df = _vec_df(spark, [(1, v), (2, twin)])
    out = S.knn_lsh(df.where("vec_id = 1"), df, "vec_id", "v", dim=64, k=1).collect()
    assert [(r.query_id, r.neighbor_id, r.rank, r.cos) for r in out] == [(1, 2, 1, 1.0)]


# ---------------------------------------------------------------- text

def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "xyzzy plugh quux"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang for r in df.select("doc_id", T.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_kmeans_step_exact_means(spark):
    """One Lloyd iteration on a hand-checkable 2-cell layout: vectors
    near [1,0] go to centroid 10, near [0,1] to centroid 20, and the new
    centroids are the exact member means."""
    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators.dedup import dot
    from sgb_data_validator_spark.operators.similarity import kmeans_step

    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.8, 0.0]),
        (4, [0.0, 1.0]), (5, [0.1, 0.9]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cent = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])], "cid int, cv array<double>"
    ).withColumn("cn", dot(F.col("cv"), F.col("cv")))
    got = {r["cid"]: (r["cv"], r["n_members"]) for r in kmeans_step(vecs, cent, "vec_id", "v").collect()}
    assert got[10] == ([0.9, 0.033333], 3)
    assert got[20] == ([0.05, 0.95], 2)
    # a second iteration from the new centroids keeps the same cells →
    # identical means (converged)
    new_cent = kmeans_step(vecs, cent, "vec_id", "v").select("cid", "cv", "cn")
    again = {r["cid"]: r["cv"] for r in kmeans_step(vecs, new_cent, "vec_id", "v").collect()}
    assert again == {cid: cv for cid, (cv, _n) in got.items()}


def test_pluggable_scorer_swaps_without_query_changes(spark):
    """A fake model-backed scorer (pandas UDF) must flow into q_lang_id
    and q_quality_score through the registry, and the defaults must come
    back after the scope exits — the fastText/BPE drop-in surface."""
    import pandas as pd

    from sgb_data_validator_spark.operators import scorers
    from sgb_data_validator_spark.plans.training_queries import q_lang_id, q_quality_score

    sf = "/root/testdata/sf0.001"
    fake_lang = scorers.batch_scorer(lambda s: pd.Series(["xx"] * len(s)), "string")
    with scorers.scoped_lang_scorer(fake_lang):
        preds = {r["lang_pred"] for r in q_lang_id(spark, sf).limit(20).collect()}
        assert preds == {"xx"}
    # default restored: heuristic argmax, never 'xx'
    assert "xx" not in {r["lang_pred"] for r in q_lang_id(spark, sf).limit(20).collect()}

    fake_q = scorers.batch_scorer(
        lambda s: pd.Series([7] * len(s), dtype="int64"), "bigint"
    )
    with scorers.scoped_quality_scorer(fake_q):
        assert {r["score"] for r in q_quality_score(spark, sf).limit(20).collect()} == {7}


def test_token_counts(spark):
    df = spark.createDataFrame([("hello, world! it's x2",), ("   ",)], "text string")
    rows = df.select(
        T.token_count_ws(F.col("text")).alias("ws"),
        T.token_count_regex(F.col("text")).alias("rx"),
    ).collect()
    assert (rows[0].ws, rows[0].rx) == (4, 8)  # hello , world ! it ' s x2
    assert (rows[1].ws, rows[1].rx) == (0, 0)


def test_quality_score_formula(spark):
    text = "the alpha beta gamma delta epsilon words"  # 7 words, all alpha+space, has 'the'
    df = spark.createDataFrame([(text,)], "text string")
    r = df.select(
        T.quality_score(F.col("text")).alias("score"),
        *[v.alias(k) for k, v in T.quality_features(F.col("text")).items()],
    ).collect()[0]
    n_chars = len(text)
    n_alpha = sum(c.isalpha() for c in text)
    alpha_bp = (n_alpha * 10_000) // n_chars
    assert r.n_words == 7 and r.alpha_bp == alpha_bp and r.punct_bp == 0
    assert r.score == 40_000 + alpha_bp * 3 + 20_000 + 10_000


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello   world  again"), (2, "hello world again"), (3, "different text")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.fp for r in df.select("doc_id", T.doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[1] == got[2] != got[3]
    mwh = df.select(T.min_word_hash(F.col("text")).alias("m")).collect()[0].m
    assert mwh == min(py_hash60(w) for w in ["hello", "world", "again"])


# ---------------------------------------------------------------- multimodal

def test_multimodal_features_match_hashlib(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    out = {r.doc_id: r for r in M.extract_features(M.attach_binary_payload(df, "text")).collect()}
    assert out[1].n_bytes == 5
    assert out[1].content_md5 == hashlib.md5(b"hello").hexdigest()
    assert out[1].first_byte == ord("h")
    assert out[1].media_type == "text/plain"
    assert out[2].n_bytes == 0 and out[2].first_byte == -1


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")


def test_word_bigrams_and_repetition(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b"),          # bigrams: "a b","b a","a b"; 4 words, 2 distinct
            (2, "   solo   "),       # 1 word — no bigrams, rep 0
            (3, ""),                 # empty — 0 words
            (4, None),
        ],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    feats = T.repetition_features(F.col("text"))
    rows = {
        r["doc_id"]: (r["n"], r["nd"], r["bp"])
        for r in df.where(F.col("text").isNotNull())
        .select("doc_id", feats["n_words"].alias("n"), feats["n_distinct"].alias("nd"),
                feats["rep_bp"].alias("bp"))
        .collect()
    }
    assert rows[1] == (4, 2, 5000)
    assert rows[2] == (1, 1, 0)
    assert rows[3] == (0, 0, 0)

    grams = (
        df.where(F.col("text").isNotNull() & F.trim(F.col("text")).rlike(r"\s"))
        .select("doc_id", T.word_bigrams(F.col("text")).alias("g"))
        .collect()
    )
    assert {r["doc_id"]: r["g"] for r in grams} == {1: ["a b", "b a", "a b"]}


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact a@b.co or c.d+x@e-f.org today"),
            (2, "server 10.0.0.1 and 192.168.1.255, id 123456789"),
            (3, "clean text, short digits 12345678"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    counts = T.pii_counts(F.col("text"))
    rows = {
        r["doc_id"]: (r["email"], r["ipv4"], r["id_number"])
        for r in df.select("doc_id", *[c.alias(n) for n, c in counts.items()]).collect()
    }
    assert rows[1] == (2, 0, 0)
    assert rows[2] == (0, 2, 1)
    assert rows[3] == (0, 0, 0)
    assert rows[4] == (0, 0, 0)


def test_kmeans_train_monotone_inertia_and_convergence(spark):
    """Lloyd descent: inertia must not increase across kmeans_step
    iterations, and kmeans_train must return the fixed point (a further
    step moves no centroid) — the trained-quantizer contract behind
    knn_ivf_with_centroids/semantic_dedup."""
    import random

    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators.dedup import dot
    from sgb_data_validator_spark.operators.similarity import (
        kmeans_inertia,
        kmeans_step,
        kmeans_train,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    vecs = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cent = vecs.where(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        dot(F.col("v"), F.col("v")).alias("cn"),
    )
    inertias = [kmeans_inertia(vecs, cent, "vec_id", "v")]
    cur = cent
    for _ in range(4):
        cur = kmeans_step(vecs, cur, "vec_id", "v").select("cid", "cv", "cn")
        inertias.append(kmeans_inertia(vecs, cur, "vec_id", "v"))
    # monotone descent up to the 6dp mean rounding (tiny slack)
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a + 1e-6, inertias
    assert inertias[-1] < inertias[0], inertias

    trained = kmeans_train(vecs, cent, "vec_id", "v", max_iter=50, tol=1e-9)
    once_more = kmeans_step(vecs, trained, "vec_id", "v")
    before = {r["cid"]: r["cv"] for r in trained.select("cid", "cv").collect()}
    after = {r["cid"]: r["cv"] for r in once_more.select("cid", "cv").collect()}
    assert before == after  # true fixed point, not just "movement < tol"


def test_kmeans_train_raises_without_convergence(spark):
    """max_iter=1 on a layout that needs several rounds must raise, not
    hand back a half-trained quantizer."""
    import pytest
    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators.dedup import dot
    from sgb_data_validator_spark.operators.similarity import kmeans_train

    # +0.1/+0.2 offsets keep every vector (and thus every centroid mean)
    # away from the zero vector, whose cosine is undefined
    rows = [(i, [float(i % 7) + 0.1, float((i * 3) % 5) + 0.2]) for i in range(1, 60)]
    vecs = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cent = vecs.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        dot(F.col("v"), F.col("v")).alias("cn"),
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kmeans_train(vecs, cent, "vec_id", "v", max_iter=1, tol=1e-12)


def test_contamination_ngram_finds_cross_source_near_dups(spark):
    """Every emitted row must be cross-source with a CORRECT exact
    bigram Jaccard ≥ 0.8 (replayed in pure Python), rows must come in
    both directions, and the injected 'evalset' leak path must fire.
    (Short-doc twins legitimately fall below 0.8 — the suffix adds 4
    bigrams — so per-twin presence is asserted only where the true
    Jaccard clears the threshold AND the pair is long enough for the
    s-curve's ~1.0 recall region, i.e. jaccard ≥ 0.9.)"""
    from sgb_data_validator_spark.plans.training_queries import (
        TEXT_TWIN_MOD,
        TEXT_TWIN_OFFSET,
        q_contamination_ngram,
    )

    sf = "/root/testdata/sf0.001"
    out = q_contamination_ngram(spark, sf).collect()
    assert out, "no contamination found though twins were injected"

    def bigrams(t: str) -> set:
        w = t.lower().strip().split()
        return {f"{a}\x1f{b}" for a, b in zip(w, w[1:])}

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .where("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    }
    for d, t in list(texts.items()):
        if d % TEXT_TWIN_MOD == 0:
            texts[d + TEXT_TWIN_OFFSET] = t + " near duplicate suffix"

    def jac(a: int, b: int) -> float:
        ga, gb = bigrams(texts[a]), bigrams(texts[b])
        return len(ga & gb) / len(ga | gb)

    pairs = set()
    saw_evalset = False
    for r in out:
        assert r["source"] != r["leaked_from_source"]
        assert r["jaccard"] >= 0.8
        # the confirm stage must be EXACT jaccard, not an estimate
        assert abs(jac(r["doc_id"], r["leaked_from"]) - r["jaccard"]) < 1e-5
        pairs.add((r["doc_id"], r["leaked_from"]))
        saw_evalset = saw_evalset or "evalset" in (r["source"], r["leaked_from_source"])
    assert saw_evalset, "no injected eval-leak twin was flagged"
    # both directions present for every pair
    assert pairs == {(b, a) for a, b in pairs}
    # high-jaccard twins sit in the banding's ~certain-recall region
    for origin in texts:
        if origin >= TEXT_TWIN_OFFSET or origin % TEXT_TWIN_MOD != 0:
            continue
        twin = origin + TEXT_TWIN_OFFSET
        if jac(origin, twin) >= 0.9:
            assert (origin, twin) in pairs, f"twin of {origin} not flagged"


def test_kmeans_train_fixed_equals_chained_steps(spark):
    """kmeans_train_fixed(n_iter=N) must return exactly what N manually
    chained kmeans_step calls return — the contract that lets the
    driver's chained-CTE oracle replay the unroll (see
    plans/extra_queries.py SQL_KMEANS_TRAIN_FIXED)."""
    import random

    from pyspark.sql import functions as F

    from sgb_data_validator_spark.operators.dedup import dot
    from sgb_data_validator_spark.operators.similarity import (
        kmeans_step,
        kmeans_train_fixed,
    )

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(90)]
    vecs = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cent = vecs.where(F.col("vec_id") % 19 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        dot(F.col("v"), F.col("v")).alias("cn"),
    )
    fixed = {
        r["cid"]: (r["cv"], r["n_members"])
        for r in kmeans_train_fixed(vecs, cent, "vec_id", "v", n_iter=3).collect()
    }
    cur = cent
    stepped = None
    for _ in range(3):
        stepped = kmeans_step(vecs, cur, "vec_id", "v")
        cur = stepped.select("cid", "cv", "cn")
    chained = {
        r["cid"]: (r["cv"], r["n_members"]) for r in stepped.collect()
    }
    assert fixed == chained
