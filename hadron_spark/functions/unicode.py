"""Unicode normalization — the NFC/NFKC corpus-hygiene pass.

Web text arrives in mixed normalization forms: the same visible
string as precomposed characters (é = U+00E9) in one document and
base + combining marks (e + U+0301) in another, plus compatibility
characters (ligatures ﬁ, fullwidth Ａ, circled ①) that tokenizers
should never see as distinct symbols.  Published pretraining
pipelines normalize before tokenization (GPT-2's byte-level BPE and
SentencePiece both assume/apply NFC-family normalization) — without
it, exact dedup misses visually-identical duplicates and the BPE
vocabulary wastes merges on compatibility variants.

This module is the package's one deliberate Python-text function:
Spark SQL exposes no Unicode normalizer (there is no `normalize`
builtin through 4.x), so the op routes through an ARROW-VECTORIZED
pandas UDF — `unicodedata.normalize` over Arrow string batches,
never per-row py4j.  The transform is a narrow zero-shuffle
projection; throughput is bounded by the Arrow transfer, not the
normalization itself.

Normalization forms are defined by the Unicode standard (UAX #15)
and every conformant implementation produces identical bytes — which
is what makes the NFC path FULLY oracle-able: DuckDB's
`nfc_normalize` must agree byte-for-byte with Python's
`unicodedata` (q242 proves it on a planted denormalization
gauntlet).  NFKC/NFD/NFKD have no DuckDB counterpart and are pinned
against `unicodedata` directly in tests.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Normalize a string column to the given Unicode form.

    NULLs pass through; normalization is idempotent, so re-running
    the pass over an already-clean corpus is a no-op (pinned in
    tests)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    c = F.col(col) if isinstance(col, str) else col

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        return s.map(
            lambda v: v if v is None else unicodedata.normalize(form, v)
        )

    return _norm(c)


def is_normalized(col: Column | str, form: str = "NFC") -> Column:
    """Boolean audit column: is the string already in `form`?  Uses
    `unicodedata.is_normalized` (quick-check fast path — no
    allocation for already-clean text, which is the common case)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    c = F.col(col) if isinstance(col, str) else col

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _chk(s):
        return s.map(
            lambda v: None if v is None else unicodedata.is_normalized(form, v)
        )

    return _chk(c)
