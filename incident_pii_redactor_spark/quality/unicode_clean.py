"""Unicode text normalization (C4/mC4-style cleanup): web text arrives
with inconsistent normal forms, non-breaking spaces, zero-width marks,
and stray control characters that break tokenizers and dedup keys (two
byte-distinct strings rendering identically hash apart).

Arrow-batched pandas UDF around ``unicodedata.normalize`` (the NFC
table ships with CPython — deterministic for a pinned interpreter):

* NFC normal form (canonical composition — é as one codepoint),
* CRLF/CR -> LF,
* non-breaking / narrow / ideographic spaces -> ASCII space,
* zero-width chars (ZWSP/ZWNJ/ZWJ/BOM) removed,
* C0/C1 control chars removed except tab and newline.

There is deliberately NO DuckDB-twinned driver query: DuckDB's
nfc_normalize uses utf8proc, whose Unicode table version can differ
from CPython's — cross-engine hash equality would pin an accident.
Semantics are test-pinned (tests/test_webtext_ops.py), and the op runs
BEFORE fingerprint/minhash so dedup keys see canonical bytes.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# explicit codepoints (not pasted glyphs — invisibles don't survive
# code review): unicode space family -> ' ', zero-width family -> ''
_SPACE_CPS = [0x00A0, 0x1680, *range(0x2000, 0x200B), 0x202F, 0x205F,
              0x3000]
_ZW_CPS = [0x200B, 0x200C, 0x200D, 0xFEFF]
_TRANSLATE = {**{cp: " " for cp in _SPACE_CPS},
              **{cp: "" for cp in _ZW_CPS}}
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")


def clean_unicode(text: str) -> str:
    """Pure-Python core (shared by the UDF and tests)."""
    if not text:
        return text or ""
    t = unicodedata.normalize("NFC", text)
    t = t.replace("\r\n", "\n").replace("\r", "\n")
    t = t.translate(_TRANSLATE)
    return _CTRL_RE.sub("", t)


def clean_unicode_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def clean(text: pd.Series) -> pd.Series:
        return text.map(lambda t: clean_unicode(t) if isinstance(t, str)
                        else t)

    return clean


def with_clean_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with its normalized form — run this before
    fingerprint/minhash so byte-distinct-but-identical-looking pages
    dedup together."""
    return df.withColumn(text_col, clean_unicode_udf()(F.col(text_col)))
