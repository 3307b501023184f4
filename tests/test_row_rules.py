"""Per-rule unit tests on tiny inline frames asserting exact violation
rows — the style of the reference's rule tests
(/root/reference/test/test_issue16_validation.py:270-534)."""

from pyspark.sql import functions as F

from sgb_data_validator_spark.operators import rules as R


def _rows(df):
    return sorted(
        (r.rule_id, r.conv_id, r.turn_idx, r.severity) for r in df.collect()
    )


def test_not_null_and_non_empty(spark):
    df = spark.createDataFrame(
        [("c1", 0, "ok", "p"), ("c1", 1, None, "p"), ("c2", 0, "   ", "p"), ("c2", 1, "", "p")],
        "conv_id string, turn_idx int, text string, part string",
    )
    rs = R.RowRuleSet().add(R.not_null("text"), R.non_empty("text"))
    assert _rows(rs.violations(df)) == [
        ("non_empty.text", "c2", 0, "error"),
        ("non_empty.text", "c2", 1, "error"),
        ("not_null.text", "c1", 1, "error"),
    ]


def test_vocab_and_gating(spark):
    # role check is gated: a row with null text must NOT also emit vocab.role
    df = spark.createDataFrame(
        [("c1", 0, "hi", "user"), ("c1", 1, "hi", "moderator"), ("c1", 2, None, "moderator")],
        "conv_id string, turn_idx int, text string, role string",
    )
    rs = R.RowRuleSet().add(
        R.not_null("text"), R.in_vocabulary("role", ["user", "assistant", "system", "tool"])
    )
    assert _rows(rs.violations(df, part_col=None)) == [
        ("not_null.text", "c1", 2, "error"),
        ("vocab.role", "c1", 1, "error"),
    ]


def test_url_in_text_truncates_to_80_chars(spark):
    long_url = "http://example.com/" + "x" * 200
    df = spark.createDataFrame(
        [("c1", 0, f"see {long_url}")], "conv_id string, turn_idx int, text string"
    )
    rs = R.RowRuleSet().add(R.no_url_in_text("text"))
    row = rs.violations(df, part_col=None).collect()[0]
    assert row.rule_id == "url_in_text.text"
    assert row.severity == "warning"
    assert len(row.offending_value) == 80  # validate.py:496-498 truncation
    assert row.offending_value.startswith("http://example.com/")


def test_url_detection_variants(spark):
    df = spark.createDataFrame(
        [("a", 0, "plain text"), ("a", 1, "see www.x.ch ok"), ("a", 2, "FTP://host/p"),
         ("a", 3, "https://a.b/c"), ("a", 4, "nothing here")],
        "conv_id string, turn_idx int, text string",
    )
    rs = R.RowRuleSet().add(R.no_url_in_text("text"))
    got = sorted(r.turn_idx for r in rs.violations(df, part_col=None).collect())
    assert got == [1, 2, 3]


def test_regex_and_case_insensitive_vocab(spark):
    df = spark.createDataFrame(
        [("a", 0, "https://ok.ch", "DE"), ("a", 1, "not-a-url", "de"),
         ("a", 2, "http://ok.ch", "xx"), ("a", 3, None, None)],
        "conv_id string, turn_idx int, url string, lang string",
    )
    rs = R.RowRuleSet().add(
        R.matches_regex("url", r"^https?://"),           # models.py:191-197
        R.in_vocabulary("lang", ["de", "fr", "it"], case_insensitive=True),  # iso639.py:199-223
    )
    assert _rows(rs.violations(df, part_col=None)) == [
        ("regex.url", "a", 1, "error"),
        ("vocab.lang", "a", 2, "error"),
    ]


def test_single_pass_plan_reads_table_once(spark):
    """All row rules must ride ONE projection — no self-union/join of the
    source (the single-pass multi-rule design, SURVEY.md §4.2)."""
    df = spark.createDataFrame([("c", 0, "t", "user")],
                               "conv_id string, turn_idx int, text string, role string")
    rs = R.RowRuleSet().add(R.not_null("text"), R.non_empty("text"),
                            R.in_vocabulary("role", ["user"]), R.no_url_in_text("text"))
    plan = rs.violations(df, part_col=None)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
