"""Text normalization and similarity scalar functions.

Re-expresses the reference's comparison primitives with JVM-side Spark
functions wherever a builtin exists, and one Arrow-vectorized pandas UDF
for the single operation Spark lacks (diacritic stripping):

- ``normalize_string`` (ws-collapse + trim + lower,
  ``/root/reference/eval/metrics.py:200-225``)        -> :func:`normalize_text`
- ``levenshtein_ratio`` (length-normalized DP,
  ``/root/reference/eval/metrics.py:228-267``)        -> :func:`levenshtein_ratio`
- diacritic strip (NFD, drop Mn marks,
  ``/root/reference/modules/line_ranges/readjuster.py:1481-1488``)
                                                      -> :func:`strip_diacritics_udf`
- punctuation strip / substring toggles
  (``readjuster.py:1494-1531``)                       -> regexp_replace options
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def normalize_text(
    col: Column | str,
    lowercase: bool = True,
    collapse_ws: bool = True,
    strip_punct: bool = False,
    strip_diacritics: bool = False,
) -> Column:
    """Configurable normalization pipeline, JVM-side except diacritics.

    Matches the reference's matching-config knobs (case sensitivity,
    whitespace, punctuation, diacritics) so equality constraints can be
    tuned per suite.
    """
    c = F.col(col) if isinstance(col, str) else col
    if strip_diacritics:
        c = strip_diacritics_udf(c)
    if strip_punct:
        c = F.regexp_replace(c, r"[^\w\s]", "")
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    if lowercase:
        c = F.lower(c)
    return c


@F.pandas_udf(StringType())
def strip_diacritics_udf(s: pd.Series) -> pd.Series:
    """NFD-decompose and drop combining marks (Mn), Arrow-vectorized.

    The only normalization step without a Spark builtin; batched via
    Arrow, never row-at-a-time Python in the JVM loop.
    """
    def _strip(v):
        if v is None:
            return None
        return "".join(
            ch for ch in unicodedata.normalize("NFD", v)
            if unicodedata.category(ch) != "Mn"
        )

    return s.map(_strip)


def levenshtein_ratio(a: Column | str, b: Column | str) -> Column:
    """Length-normalized Levenshtein similarity in [0, 1]; 1.0 when both
    empty (mirrors the guard in ``eval/metrics.py:240-246``)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    denom = F.greatest(F.length(ca), F.length(cb))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(ca, cb) / denom.cast("double")
    )
