"""Arrow-batched pandas UDFs — the ONLY Python in any hot path.

Three UDFs exist, in increasing Python-ness:

* ``entities_nfc_udf`` — html.unescape + NFC per batch. NFC rides
  pandas' vectorized ``Series.str.normalize``; unescape is a cheap map
  only applied to strings that actually contain ``&`` (the common case
  skips it). Used inside the otherwise-native ``text_pipeline``.
* ``apply_text_transformations_udf`` — the full pure-Python reference
  pipeline per value (pytext.apply_text_transformations). The
  exact-parity path: byte-identical to reference semantics regardless
  of regex dialect. ~5-10× slower than the native pipeline — use for
  parity verification and small/medium corpora.
* ``normalize_name_udf`` — dedup key normalization.

UDFs are built lazily (PySpark 4 resolves the return type against the
active session, so decorating at import time breaks import order) and
cached per process.
"""

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column


@lru_cache(maxsize=None)
def _udfs():
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from sgb_data_validator_spark.functions import pytext

    @pandas_udf(StringType())
    def entities_nfc(s: pd.Series) -> pd.Series:
        has_amp = s.str.contains("&", regex=False, na=False)
        if has_amp.any():
            s = s.copy()
            s[has_amp] = s[has_amp].map(pytext.convert_html_entities)
        return s.str.normalize("NFC")

    @pandas_udf(StringType())
    def apply_all(s: pd.Series) -> pd.Series:
        return s.map(pytext.apply_text_transformations, na_action="ignore")

    @pandas_udf(StringType())
    def norm_name(s: pd.Series) -> pd.Series:
        return s.map(pytext.normalize_name, na_action="ignore")

    @pandas_udf(StringType())
    def iconclass_parts_joined(s: pd.Series) -> pd.Series:
        # exact-parity Iconclass expansion (pytext.iconclass_parts),
        # parts joined with '|' — covers the exotic notations (unclosed
        # parens, nested specials) the native codegen path gates out
        return s.map(lambda n: "|".join(pytext.iconclass_parts(n)), na_action="ignore")

    return {
        "entities_nfc": entities_nfc,
        "apply_all": apply_all,
        "norm_name": norm_name,
        "iconclass_parts": iconclass_parts_joined,
    }


def entities_nfc_udf(col) -> Column:
    return _udfs()["entities_nfc"](col)


def apply_text_transformations_udf(col) -> Column:
    return _udfs()["apply_all"](col)


def normalize_name_udf(col) -> Column:
    return _udfs()["norm_name"](col)


def iconclass_parts_udf(col) -> Column:
    """'|'-joined exact-parity Iconclass parts (reference splitter
    semantics for ALL inputs, including exotic ones)."""
    return _udfs()["iconclass_parts"](col)
