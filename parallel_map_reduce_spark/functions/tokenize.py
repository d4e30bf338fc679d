"""Normative tokenizer — the golden spec of the reference engine.

The reference tokenizes with C++ ``istringstream >> word``
(reference: src/utils.cpp:8-14), i.e. maximal runs of non-whitespace
bytes split on C-locale whitespace ``[ \\t\\n\\r\\v\\f]``. Verified
byte-identical against the reference outputs: re-tokenizing the 15-file
corpus with this regex reproduces serial_wc.txt exactly — 2,297,140
tokens, 109,223 distinct words (SURVEY.md §2.2).

Semantics preserved on purpose:
- case-sensitive, punctuation-retaining (``of`` vs ``of:`` are distinct)
- no unicode normalization; a BOM-prefixed token stays BOM-prefixed
- empty strings (whitespace runs at string edges) are dropped

Everything stays JVM-side (split/explode/filter are codegen'd) — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java-regex form of C-locale whitespace: space, tab, LF, CR, VT, FF.
TOKEN_SPLIT_REGEX = "[ \\t\\n\\r\\x0B\\f]+"

# Same character class for the DuckDB (RE2) oracle SQL.
TOKEN_SPLIT_REGEX_SQL = r"[ \t\n\r\x0b\x0c]+"


def tokens(text_col: str | Column) -> Column:
    """Array of byte-exact tokens for one text value (may contain '')."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(col, TOKEN_SPLIT_REGEX)


def token_count(text_col: str | Column) -> Column:
    """Number of tokens in a text value, JVM-side (no explode needed)."""
    arr = tokens(text_col)
    return F.size(F.filter(arr, lambda w: w != F.lit("")))
