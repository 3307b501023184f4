"""sgb_data_validator_spark — a PySpark-native schema + constraint
validation engine for large-scale tables of multi-turn conversation /
agent transcripts, with the query semantics of the reference validator
``Stadt-Geschichte-Basel/sgb-data-validator`` re-expressed Spark-first.

Design (see SURVEY.md for the full blueprint):

* Everything is declared with the DataFrame API and left to Catalyst /
  AQE for physical planning; Python UDFs appear only as Arrow-batched
  pandas UDFs where column expressions genuinely can't express the
  semantics (NFC normalization, HTML entities, MinHash, SimHash).
* The unit of output is a ``violations`` DataFrame
  ``(rule_id, conv_id, turn_idx, column, offending_value, severity,
  part)`` — the Spark analog of the reference's ``DataValidationError``
  (reference validate.py:37-49) — and per-partition ``verdicts``.
* Scale posture: single-pass multi-rule row projection (one scan, N
  rules), broadcast joins for dimension membership, explicit two-stage
  salted aggregation for skew-prone uniqueness counts, per-partition
  ledger for resumability.
"""

__version__ = "0.1.0"

from sgb_data_validator_spark.session import get_spark  # noqa: F401
