"""Iconclass hierarchical-notation membership (J3, full semantics).

Reference behavior being re-expressed
(/root/reference/src/iconclass.py:64-99, vocabularies.py:57-87; golden
cases in /root/reference/test/test_iconclass.py):

* a notation expands to hierarchical *parts*: character-by-character
  prefixes of base segments, a ``prefix(...)`` placeholder per
  parenthetical qualifier, and incremental ``prefix(+X)``, ``prefix(+XY)``
  keys for ``(+XYZ)`` additions;
* the notation is valid iff any part is in the vocabulary, or the
  notation starts with any vocabulary code.

Spark-first re-expression: every character-prefix part is by
construction a *prefix of the notation itself*, so "any part in vocab"
collapses to "notation startswith some vocab code" for all of them. The
only parts that are NOT prefixes of the notation are

* the ``(...)`` placeholders (``11H(...)`` vs ``11H(JEROME)``), and
* the *incomplete* plus-keys (``11H(+3)`` vs ``11H(+31)``),

so membership is exactly::

    exists(vocab, v -> code startswith v)  OR  specials(code) ∩ vocab ≠ ∅

with ``specials`` computable in ONE codegen projection: mark paren
boundaries with a \\x1f sentinel, split, and expand each parenthetical
segment against the literal prefix before it. No join, no shuffle, no
Python — and the same construction is ANSI-SQL-expressible for the
DuckDB oracle (plans/extra_queries.py).

Scope note: codes must be *well-formed* (balanced, non-nested parens).
The reference's splitter quietly treats an unclosed ``(`` as base
characters; here such codes fail the format gate instead — the
exact-parity path for exotic inputs is the pure-Python
``functions.pytext.iconclass_parts`` (pandas-UDF-wrappable), golden-
tested against the reference cases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: allowed characters (reference iconclass.py:50)
ICONCLASS_CHARSET = r"^[0-9A-Zq()+\s.]+$"
#: balanced single-level parens — the grammar the native expansion covers
ICONCLASS_WELL_FORMED = r"^[^()]*(\([^()]*\)[^()]*)*$"

_US = "\x1f"  # unit separator — cannot appear in a valid notation


def _segments(code: Column) -> Column:
    """Split a well-formed code into base / parenthetical segments, in
    order, delimiters kept: '11H(JEROME)(+3)' → ['11H','(JEROME)','(+3)']."""
    marked = F.regexp_replace(F.regexp_replace(code, r"\(", _US + "("), r"\)", ")" + _US)
    return F.filter(F.split(marked, _US), lambda s: s != F.lit(""))


def iconclass_special_parts(code: Column) -> Column:
    """The expansion parts that are not plain prefixes of the code:
    placeholder parts and incomplete plus-keys (see module docstring)."""
    segs = _segments(code)

    def expand(i: Column) -> Column:
        seg = F.element_at(segs, i)
        prefix = F.concat_ws("", F.slice(segs, F.lit(1), i - 1))
        inner_len = F.length(seg) - 3  # chars between '(+' and ')'
        plus_keys = F.when(
            inner_len >= 2,
            F.transform(
                F.sequence(F.lit(1), inner_len - 1),
                lambda j: F.concat(prefix, F.lit("(+"), F.substring(seg, F.lit(3), j), F.lit(")")),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return (
            F.when(seg.startswith("(+"), plus_keys)
            .when(
                seg.startswith("(") & (seg != F.lit("(...)")),
                F.array(F.concat(prefix, F.lit("(...)"))),
            )
            .otherwise(F.array().cast("array<string>"))
        )

    return F.flatten(F.transform(F.sequence(F.lit(1), F.size(segs)), expand))


def iconclass_format_ok(code: Column) -> Column:
    """Charset + non-empty + balanced-paren grammar gate."""
    return (
        code.rlike(ICONCLASS_CHARSET)
        & (F.trim(code) != "")
        & code.rlike(ICONCLASS_WELL_FORMED)
    )


def iconclass_member_ok(code: Column, vocabulary: list[str]) -> Column:
    """Hierarchical membership against a literal vocabulary array:
    startswith-any (covers every prefix part) OR a special part present."""
    vocab = F.array(*[F.lit(v) for v in vocabulary])
    return F.exists(vocab, lambda v: code.startswith(v)) | F.arrays_overlap(
        iconclass_special_parts(code), vocab
    )


def iconclass_is_valid(code: Column, vocabulary: list[str]) -> Column:
    """True iff ``code`` is format-valid and hierarchically reaches the
    vocabulary. Vocabulary rides as a literal array (the reference set is
    a few hundred codes) — pure codegen, broadcast-free."""
    return iconclass_format_ok(code) & iconclass_member_ok(code, vocabulary)


def iconclass_violations(
    df: DataFrame,
    id_col: str,
    code_col: str,
    vocabulary: list[str],
    severity: str = "error",
) -> DataFrame:
    """Violation rows for notations that fail the format gate
    (`iconclass.format`) or never reach the vocabulary
    (`iconclass.member`). One codegen projection — no join, no shuffle.
    Composes the same predicates as :func:`iconclass_is_valid`."""
    code = F.col(code_col)
    format_bad = code.isNotNull() & ~iconclass_format_ok(code)
    member_bad = (
        code.isNotNull() & ~format_bad & ~iconclass_member_ok(code, vocabulary)
    )
    return df.where(format_bad | member_bad).select(
        F.when(format_bad, F.lit("iconclass.format"))
        .otherwise(F.lit("iconclass.member"))
        .alias("rule_id"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.lit(code_col).alias("column"),
        F.substring(code.cast("string"), 1, 80).alias("offending_value"),
        F.lit(severity).alias("severity"),
    )
