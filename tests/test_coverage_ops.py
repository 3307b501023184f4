"""Round-2 coverage operators: ISO 639-1 vocabulary, full Iconclass
parts semantics (golden cases mirror the reference's
test/test_iconclass.py behaviors), private-flag propagation, the
empty-shingle LSH guard, and the previously-unexercised normalize_name.
"""

import pytest
from pyspark.sql import functions as F

from sgb_data_validator_spark.functions.pytext import (
    iconclass_is_valid,
    iconclass_parts,
    normalize_name,
)
from sgb_data_validator_spark.operators.iconclass import iconclass_violations
from sgb_data_validator_spark.operators.referential import propagate_private_flag
from sgb_data_validator_spark.vocab import ISO_639_1_CODES


def test_iso639_exact_count_and_membership():
    # reference parity: exactly 184 two-letter codes
    # (/root/reference/test/test_iso639.py:106)
    assert len(ISO_639_1_CODES) == 184
    assert all(len(c) == 2 and c.islower() for c in ISO_639_1_CODES)
    for c in ("en", "de", "fr", "zh", "rm"):
        assert c in ISO_639_1_CODES
    for c in ("xx", "q", "eng"):
        assert c not in ISO_639_1_CODES


# --- Iconclass: pure-Python parts (exact reference parity) ---------------

def test_iconclass_parts_basic():
    assert iconclass_parts("11H") == ["1", "11", "11H"]
    p = iconclass_parts("25F23")
    for expect in ("2", "25", "25F", "25F2", "25F23"):
        assert expect in p


def test_iconclass_parts_parenthetical():
    p = iconclass_parts("25F23(DOG)")
    assert "25F23" in p and "25F23(...)" in p and "25F23(DOG)" in p


def test_iconclass_parts_plus_keys():
    p = iconclass_parts("11H(+31)")
    assert "11H(+3)" in p and "11H(+31)" in p
    # complex: qualifier then key
    p = iconclass_parts("11H(JEROME)(+3)")
    for expect in ("11H", "11H(...)", "11H(JEROME)", "11H(JEROME)(+3)"):
        assert expect in p


def test_iconclass_parts_placeholder_literal():
    # a literal (...) group adds itself once, no duplicate placeholder
    p = iconclass_parts("11H(...)")
    assert p.count("11H(...)") == 1


def test_iconclass_is_valid_python():
    vocab = {"11H(...)", "25F23", "11H(+3)"}
    assert iconclass_is_valid("11H(JEROME)", vocab)       # placeholder
    assert iconclass_is_valid("11H(+31)", vocab)          # incremental key
    assert iconclass_is_valid("25F23(DOG)", vocab)        # startswith
    assert not iconclass_is_valid("11H", vocab)
    assert not iconclass_is_valid("11H@", vocab)          # charset
    assert not iconclass_is_valid("", vocab)
    assert not iconclass_is_valid(None, vocab)


# --- Iconclass: native operator parity with the Python path --------------

NATIVE_CASES = [
    "11H", "11H(JEROME)", "11H(+31)", "25F23(DOG)", "11H(+4)",
    "11H@", "11H(...)", "25F23", "11Hq", "11 H", "11.H",
    "11H(JEROME)(+3)", "1", "(DOG)", "(+3)",
]


def test_iconclass_native_matches_python(spark):
    vocab = ["11H(...)", "25F23", "11H(+3)"]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(NATIVE_CASES)], "id int, code string"
    )
    flagged = {
        r["doc_id"]
        for r in iconclass_violations(df, "id", "code", vocab).collect()
    }
    for i, c in enumerate(NATIVE_CASES):
        expect_bad = not iconclass_is_valid(c, set(vocab))
        assert (str(i) in flagged) == expect_bad, f"case {c!r}"


def test_iconclass_is_valid_column(spark):
    """The Column-level validity predicate agrees with the Python path
    (and with the violations operator it composes)."""
    from sgb_data_validator_spark.operators.iconclass import (
        iconclass_is_valid as col_valid,
    )

    vocab = ["11H(...)", "25F23", "11H(+3)"]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(NATIVE_CASES)], "id int, code string"
    )
    got = {
        r["id"]: r["ok"]
        for r in df.select("id", col_valid(F.col("code"), vocab).alias("ok")).collect()
    }
    for i, c in enumerate(NATIVE_CASES):
        assert got[i] == iconclass_is_valid(c, set(vocab)), f"case {c!r}"


def test_iconclass_native_rule_split(spark):
    vocab = ["11H"]
    df = spark.createDataFrame(
        [(1, "11H@"), (2, "99"), (3, "11H(")], "id int, code string"
    )
    rows = {r["doc_id"]: r["rule_id"] for r in iconclass_violations(df, "id", "code", vocab).collect()}
    assert rows["1"] == "iconclass.format"
    assert rows["2"] == "iconclass.member"
    # unbalanced parens: outside the native grammar -> format violation
    # (documented divergence; the Python path is the exotic-input oracle)
    assert rows["3"] == "iconclass.format"


# --- private-flag propagation -------------------------------------------

def test_propagate_private_flag(spark):
    parents = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, True)], "pid int, is_public boolean"
    )
    children = spark.createDataFrame(
        [(1, True), (1, False),   # one private child -> parent private
         (2, True), (2, None),    # null child flag counts as public
         (3, True)],              # private parent stays private
        "fk int, is_public boolean",
    )
    out = {
        r["pid"]: r["effective_is_public"]
        for r in propagate_private_flag(parents, children, "pid", "fk").collect()
    }
    assert out == {1: False, 2: True, 3: False, 4: True}  # 4: childless


# --- empty-shingle LSH guard (advisor finding) ---------------------------

def test_minhash_simhash_drop_shingleless_docs(spark):
    from sgb_data_validator_spark.operators.dedup import (
        minhash_candidate_pairs,
        simhash_near_duplicates,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, ""), (4, "the quick brown fox"),
         (5, "the quick brown fox")],
        "id int, text string",
    )
    # bigram shingles: docs 1-3 have none and must NOT appear as pairs
    mh = minhash_candidate_pairs(df, "id", "text", shingle_n=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in mh} == {(4, 5)}
    sh = simhash_near_duplicates(df, "id", "text", shingle_n=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in sh} == {(4, 5)}


# --- F9: literal-only conditional transform ------------------------------

def test_transform_literal_only(spark):
    from sgb_data_validator_spark.functions.native import (
        normalize_whitespace,
        transform_literal_only,
    )

    df = spark.createDataFrame(
        [("literal", "  a   b  "), ("uri", "  a   b  "), ("literal", None)],
        "ptype string, val string",
    )
    out = df.select(
        "ptype",
        transform_literal_only(
            F.col("val"), F.col("ptype"), normalize_whitespace(F.col("val"))
        ).alias("v"),
    ).collect()
    got = {(r["ptype"], r["v"]) for r in out}
    assert ("literal", "a b") in got      # literal: transformed
    assert ("uri", "  a   b  ") in got    # non-literal: untouched
    assert ("literal", None) in got       # null passthrough


# --- sessionization -------------------------------------------------------

def test_sessionize_matches_plain_window(spark):
    """Chunked sessionize (chunk=3, forcing cross-chunk carries and
    prefix offsets) must equal the unchunked definition."""
    import datetime as dt

    from sgb_data_validator_spark.operators.windows import sessionize

    rows = []
    ts = dt.datetime(2026, 1, 5, 0, 0)
    for i in range(10):
        # gaps > 1h before idx 4 and idx 8 → sessions 0,0,0,0,1,1,1,1,2,2
        if i in (4, 8):
            ts += dt.timedelta(hours=2)
        else:
            ts += dt.timedelta(minutes=5)
        rows.append(("c1", i, ts))
    turns = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    got = {
        r.turn_idx: r.session_idx
        for r in sessionize(turns, gap_us=3600 * 1_000_000, chunk=3).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1, 7: 1, 8: 2, 9: 2}


# --- top-k frequent values -------------------------------------------------

def test_top_values_deterministic_ties(spark):
    from sgb_data_validator_spark.operators.stats import top_values

    df = spark.createDataFrame(
        [("p", "b")] * 2 + [("p", "a")] * 2 + [("p", "c")] * 3 + [("p", None)],
        "part string, v string",
    )
    got = [(r.value, r.n, r.rank) for r in top_values(df, "v", k=2).orderBy("rank").collect()]
    # c wins on count; a beats b on the value tiebreak; nulls excluded
    assert got == [("c", 3, 1), ("a", 2, 2)]


# --- stratified sampling ---------------------------------------------------

def test_stratified_sample_deterministic_and_rated(spark):
    from sgb_data_validator_spark.operators.sampling import stratified_sample

    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
    )
    rates = {"en": 5_000, "de": 500}
    s1 = {r.k for r in stratified_sample(df, "k", "lang", rates).collect()}
    s2 = {r.k for r in stratified_sample(df.repartition(7), "k", "lang", rates).collect()}
    assert s1 == s2  # same rows regardless of partitioning
    en = sum(1 for k in s1 if k % 2 == 0) / 5_000
    de = sum(1 for k in s1 if k % 2 == 1) / 5_000
    assert abs(en - 0.5) < 0.05 and abs(de - 0.05) < 0.02
    # absent stratum defaults to drop
    df2 = df.withColumn("lang", F.lit("fr"))
    assert stratified_sample(df2, "k", "lang", rates).count() == 0


# --- connected components over dedup pairs -------------------------------

def test_dedup_clusters_transitive(spark):
    from sgb_data_validator_spark.operators.dedup import dedup_clusters

    # chain 1-2-3-4 (transitive merge), separate pair 7-8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "id_a int, id_b int"
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}


def test_dedup_clusters_nonconvergence_raises(spark):
    import pytest as _pytest

    from sgb_data_validator_spark.operators.dedup import dedup_clusters

    # a path graph needs ~diameter rounds; backstop of 1 must trip loudly
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a int, id_b int"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, max_iterations=1)


def test_iconclass_parts_udf_frame_parity(spark):
    """The pandas-UDF path over a frame must agree with the pure
    exact-parity splitter on every exotic notation (unclosed parens,
    nested specials, empty parens, bare plus)."""
    from sgb_data_validator_spark.functions.pytext import iconclass_parts
    from sgb_data_validator_spark.functions.vectorized import iconclass_parts_udf
    from sgb_data_validator_spark.plans.coverage_queries import ICONCLASS_EXOTIC

    df = spark.createDataFrame([(n,) for n in ICONCLASS_EXOTIC], "notation string")
    got = {
        r["notation"]: r["parts"]
        for r in df.select("notation", iconclass_parts_udf("notation").alias("parts")).collect()
    }
    assert got == {n: "|".join(iconclass_parts(n)) for n in ICONCLASS_EXOTIC}


def test_dedup_clusters_star_matches_propagation(spark):
    from sgb_data_validator_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_star,
    )

    # mixed topology: chain, triangle sharing a node, isolated pair,
    # duplicate + reversed edges
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 10), (10, 11), (11, 4),
         (20, 21), (21, 20), (2, 1)],
        "id_a int, id_b int",
    )
    prop = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    star = {r.doc_id: r.cluster_id for r in dedup_clusters_star(pairs).collect()}
    assert star == prop
    assert star == {1: 1, 2: 1, 3: 1, 4: 1, 10: 1, 11: 1, 20: 20, 21: 20}


def test_dedup_clusters_star_deep_chain(spark):
    """Diameter-50 chain: propagation's default backstop must trip
    loudly, star contraction must converge in O(log n) rounds."""
    import pytest as _pytest

    from sgb_data_validator_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_star,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 51)], "id_a int, id_b int"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, max_iterations=20)
    got = {r.doc_id: r.cluster_id for r in dedup_clusters_star(pairs, max_iterations=10).collect()}
    assert got == {i: 1 for i in range(1, 52)}


# --- backup / restore (S10) ----------------------------------------------

def test_backup_restore_verify(spark, tmp_path):
    from sgb_data_validator_spark.sources.backup import (
        backup_tables,
        restore_tables,
        verify_backup,
    )

    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, s string")
    d = str(tmp_path / "bk")
    m = backup_tables({"t": df}, d)
    assert m["tables"]["t"]["rows"] == 2
    back = restore_tables(spark, d)["t"]
    assert back.schema == df.schema  # explicit-schema restore, no inference
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "a"), (2, None)]
    v = verify_backup(spark, d)
    assert v["t"]["ok"] is True


# --- PSI drift: vanished category must register --------------------------

def test_psi_counts_vanished_category(spark):
    from sgb_data_validator_spark.operators.drift import psi

    turns = spark.createDataFrame(
        [("p1", "user")] * 10, "part string, role string"
    )
    baseline = spark.createDataFrame(
        [("role", "user", 0.5), ("role", "assistant", 0.5)],
        "dim string, value string, freq double",
    )
    got = psi(turns, baseline, "role").collect()[0]
    # 'assistant' vanished: its (eps - 0.5)ln(eps/0.5) term dominates —
    # a KL(p||q) that only iterates observed categories would miss it
    assert got.psi > 5.0


# --- multimodal frame-sample / resize plumbing ---------------------------

def test_sample_frames_and_resize(spark):
    from sgb_data_validator_spark.operators.multimodal import (
        attach_binary_payload,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame([(1, "a" * 130), (2, "")], "doc_id long, text string")
    payload = attach_binary_payload(docs, "text")
    frames = {
        (r.doc_id, r.frame_idx): r.frame_bytes
        for r in sample_frames(payload, frame_size=64, every=2).collect()
    }
    # doc 1: 130 bytes → frames 0 (64), 1 (64), 2 (2); every=2 keeps 0 and 2
    assert frames == {(1, 0): 64, (1, 2): 2}
    rs = {r.doc_id: (r.n_px, r.out_w, r.out_h) for r in resize_images(payload, 4, 4).collect()}
    assert rs[1] == (16, 4, 4) and rs[2] == (16, 4, 4)  # empty pads to n_px


# --- normalize_name (F12, previously unexercised) ------------------------

def test_normalize_name():
    assert normalize_name("  Erasmus   von\tRotterdam ") == "erasmus von rotterdam"
    assert normalize_name("M&uuml;ller") == "müller"
    assert normalize_name(None) == ""
    assert normalize_name("") == ""


# --- fuzzy exact-parity scorer (reference SequenceMatcher semantics) -----

def test_normalize_match_text():
    from sgb_data_validator_spark.functions.pytext import normalize_match_text

    # NFKC+lower, dash unification, diacritic strip, stopwords, word soup
    assert normalize_match_text("Häuser – und Höfe, Basel Bd. 2") == "hauser und hofe 2"
    assert normalize_match_text("Stadt.Geschichte.Basel (Hg.)") == ""
    assert normalize_match_text(None) == ""


def test_partial_ratio_directional():
    from sgb_data_validator_spark.functions.pytext import partial_ratio

    assert partial_ratio("abc", "xx abc yy") == 1.0            # containment
    assert partial_ratio("", "x") == 0.0
    # directionality: a short haystack cannot contain a long needle —
    # the documented false-positive guard (transformations.py:565-573)
    long_title = "eine lange geschichte der stadt im mittelalter"
    assert partial_ratio(long_title, "ch") < 0.5
    # but the swapped direction would have matched high — prove the
    # asymmetry the reference engineered
    assert partial_ratio("ch", long_title) == 1.0
    # sliding window beats whole-string ratio for embedded near-matches
    assert partial_ratio("gescichte", "eine lange geschichte der stadt") > 0.85


def test_fuzzy_best_match_exact(spark):
    from sgb_data_validator_spark.operators.fuzzy import fuzzy_best_match_exact

    fact = spark.createDataFrame(
        [(1, "Eine lange Geschichte der Stadt, Basel Bd. 1"),
         (2, "völlig anderes buch")],
        "id int, cite string",
    )
    dim = spark.createDataFrame(
        [("d1", "Eine lange Geschichte der Stadt"), ("d2", "Etwas ganz anderes")],
        "key string, title string",
    )
    got = {r["fact_key"]: (r["dim_key"], r["score"])
           for r in fuzzy_best_match_exact(fact, dim, "id", "cite", "key", "title").collect()}
    assert got[1][0] == "d1" and got[1][1] == 1.0
    assert 2 not in got  # below threshold


def test_normalize_name_udf(spark):
    from sgb_data_validator_spark.functions.vectorized import normalize_name_udf

    df = spark.createDataFrame([("  A  B ",), ("M&amp;M",)], "name string")
    got = [r[0] for r in df.select(normalize_name_udf(F.col("name"))).collect()]
    assert got == ["a b", "m&m"]


def test_volume_anomaly_single_day_not_null(spark, tmp_path):
    """One distinct day ⇒ stddev_samp is NULL; z_score/is_anomalous must
    coalesce to 0.0/false so boolean filters behave either way round."""
    from sgb_data_validator_spark.plans.coverage_queries import q_volume_anomaly

    rows = [(i, 1, "click", 1.0) for i in range(50)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, value double") \
        .withColumn("ts", F.to_timestamp(F.lit("2026-01-05 10:00:00")))
    sf = str(tmp_path / "sf")
    ev.write.parquet(f"{sf}/events.parquet")
    out = q_volume_anomaly(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["std_rows"] is None
    assert out[0]["z_score"] == 0.0
    assert out[0]["is_anomalous"] is False
