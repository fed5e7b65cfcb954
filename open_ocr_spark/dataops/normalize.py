"""Unicode normalization (NFC/NFD/NFKC/NFKD) — the prerequisite pass
before any hash-based dedup or exact-match join over web text.

The same visible string arrives from the web in multiple codepoint
spellings (precomposed 'é' vs 'e'+COMBINING ACUTE, reordered combining
marks, fullwidth compatibility forms); without normalization, exact
dedup (dataops/dedup.py), line dedup, substring dedup and
decontamination all silently treat equal-looking text as distinct.
Canonical forms (NFC/NFD) are stable across Unicode versions for
assigned codepoints (the normalization stability policy), which is what
makes the result reproducible enough to oracle: DuckDB's
nfc_normalize() and Python's unicodedata agree (verified empirically on
decomposed accents, combining reordering, ligatures and fullwidth
forms — canonical forms leave the latter two alone).

Scale shape: a vectorized pandas_udf projection — no shuffle, no join;
Arrow-batched, the declared slow-path pattern this repo uses wherever a
real computation has no Catalyst builtin (Spark has no normalization
expression).  Compatibility forms (NFKC/NFKD) are offered for pipeline
use but the oracle sticks to NFC, the only form DuckDB exposes.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize(col, form: str = "NFC") -> Column:
    """A Column of `col` normalized to `form` (None passes through)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}: {form}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x)
            if x is not None
            else None
        )

    return _norm(col if isinstance(col, Column) else F.col(col))
