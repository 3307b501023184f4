"""Text-function parity: golden examples from the reference's documented
behavior (transformations.py docstrings/tests semantics) + native-vs-exact
equality over the fixture corpus (input_hint: per-turn text equality under
stable (conv_id, turn_idx) ordering)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from sgb_data_validator_spark.functions import native, pytext
from sgb_data_validator_spark.functions.vectorized import apply_text_transformations_udf
from sgb_data_validator_spark.sources.generator import FixtureConfig, generate_turns

GOLDEN = [
    ("a  b​c  d ", "a bc d"),
    ("  x\t\ty \n\n\n\nz  ", "x y\n\nz"),
    ("&auml;lter &amp; sch&ouml;n", "älter & schön"),
    ("Holbein d.j. und D.Ä.", "Holbein d. J. und d. Ä."),
    ("(https://a.ch/x)[lbl]", "[lbl](https://a.ch/x)"),
    ("(lbl)[www.b.com/y]", "[lbl](www.b.com/y)"),
    ("[https://a.ch/x](lbl)", "[lbl](https://a.ch/x)"),
    ("[lbl] https://a.ch/x end", "[lbl](https://a.ch/x) end"),
    ("[ok](https://a.ch/x)", "[ok](https://a.ch/x)"),
    ("see m.wikidata.org/wiki/Q42", "see https://www.wikidata.org/wiki/Q42"),
    ("http://a.ch// end", "http://a.ch end"),
    ("zürich", "zürich"),  # NFC composes u + combining diaeresis
]


def test_pytext_golden():
    for raw, want in GOLDEN:
        assert pytext.apply_text_transformations(raw) == want, raw


def test_native_pipeline_matches_golden(spark):
    df = spark.createDataFrame([(r,) for r, _ in GOLDEN], "text string")
    got = [r.o for r in df.select(native.text_pipeline(F.col("text")).alias("o")).collect()]
    assert got == [w for _, w in GOLDEN]


def test_exact_udf_matches_golden(spark):
    df = spark.createDataFrame([(r,) for r, _ in GOLDEN], "text string")
    got = [r.o for r in df.select(apply_text_transformations_udf(F.col("text")).alias("o")).collect()]
    assert got == [w for _, w in GOLDEN]


def test_native_equals_exact_on_corpus_under_stable_ordering(spark):
    """The input_hint invariant: per-turn text equality verified under the
    stable (conv_id, turn_idx) window ordering."""
    turns = generate_turns(spark, FixtureConfig(n_turns=2000)).where(F.col("text").isNotNull())
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = (
        turns.withColumn("rn", F.row_number().over(w))
        .select(
            "conv_id", "rn",
            native.text_pipeline(F.col("text")).alias("a"),
            apply_text_transformations_udf(F.col("text")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
    )
    assert out.count() == 0


def test_qid_extraction(spark):
    df = spark.createDataFrame([("Q1 and Q22 then Q1 xQ3 Q22",), ("none",)], "text string")
    got = [list(r.q) for r in df.select(native.extract_wikidata_qids(F.col("text")).alias("q")).collect()]
    assert got == [["Q1", "Q22"], []]
    assert pytext.extract_wikidata_qids("Q1 and Q22 then Q1 xQ3 Q22") == ["Q1", "Q22"]


def test_null_and_empty_passthrough(spark):
    df = spark.createDataFrame([(None,), ("",)], "text string")
    got = [r.o for r in df.select(native.text_pipeline(F.col("text")).alias("o")).collect()]
    assert got == [None, ""]


def test_canonicalize_url(spark):
    cases = [
        # fragment + authority case (path case preserved)
        ("HTTPS://Example.COM/Path/To#frag", "https://example.com/Path/To"),
        # default ports stripped, non-default kept
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        # https:80 is NOT default — kept
        ("https://example.com:80/a", "https://example.com:80/a"),
        # utm params stripped wherever they sit; real params survive
        ("https://e.com/a?utm_source=x&b=2", "https://e.com/a?b=2"),
        ("https://e.com/a?b=2&utm_source=x", "https://e.com/a?b=2"),
        ("https://e.com/a?utm_a=1&utm_b=2", "https://e.com/a"),
        # duplicate + trailing slashes; root slash untouched
        ("https://e.com//a///b//", "https://e.com/a/b"),
        ("https://e.com/", "https://e.com/"),
        ("https://e.com/a/?x=1", "https://e.com/a?x=1"),
        # idempotent on an already-canonical URL
        ("https://e.com/a?b=2", "https://e.com/a?b=2"),
        # no scheme -> authority rules don't fire, path rules still do
        ("e.com/a//b/", "e.com/a/b/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r.c for r in df.select(native.canonicalize_url(F.col("u")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_canonicalize_url_fixed_point(spark):
    # canonical(canonical(u)) == canonical(u) for every dirty spelling
    dirty = [
        "HTTPS://A.B.COM:443//x//y/?utm_c=1&k=2#z",
        "http://a.com:80/p/",
        "https://a.com/p?utm_only=1",
    ]
    df = spark.createDataFrame([(u,) for u in dirty], "u string")
    once = df.select(native.canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(F.col("c").alias("a"), native.canonicalize_url(F.col("c")).alias("b"))
    assert all(r.a == r.b for r in twice.collect())
