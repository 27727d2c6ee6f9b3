"""ASCII-scoped case folding — the engine's cross-engine text-folding
contract (r12 case-fold sweep).

Full Unicode case mapping is NOT replayable across engines: Java (Spark)
applies the full, partly CONTEXTUAL mapping — U+0130 İ lowers to
``i`` + COMBINING DOT ABOVE (two code points), word-final Σ lowers to ς,
titlecase digraphs (Ǆ/ǅ) and ligatures have their own rules — while
DuckDB's utf8proc applies the simple one-to-one map (İ → i, Σ → σ
everywhere).  The mapping also drifts across JDK and UCD versions.  A
probe corpus of case traps (Turkish dotted/dotless I, ß/ẞ, Greek final
sigma, titlecase digraphs, compatibility ligatures) diverged 12 lexical
statistics at once.

The contract: tokenization case-folds ASCII A-Z only and preserves every
other code point verbatim.  Both engines implement ``translate`` over
the 26-letter table identically, the fold is total, byte-stable, and
version-independent, and non-Latin scripts — which dominate multilingual
corpora and mostly have no case at all — pass through untouched.  (The
pyspark.ml MinHashLSH path keeps RegexTokenizer's Java lowercasing: its
certificate replay is Spark-vs-Spark, so no cross-engine mapping is
involved.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


#: Explicit ASCII whitespace class — the tokenizer-split contract.
#: Java's ``\s`` includes \x0B (vertical tab); RE2's (DuckDB) does not,
#: so a bare ``\s+`` split tokenizes VT-bearing text differently per
#: engine (r12 exotic-whitespace sweep: 18 lexical statistics diverged
#: at once).  Both engines read this explicit class identically; it
#: equals Java's ``\s`` set exactly, so Spark behavior is unchanged.
WS_RE = r"[ \t\n\f\r\x0b]+"


def ascii_fold(col: str | Column) -> Column:
    """Fold ASCII A-Z to a-z; every other code point passes verbatim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_UPPER, ASCII_LOWER)


def sql_ascii_fold(expr: str) -> str:
    """DuckDB twin of :func:`ascii_fold`."""
    return f"translate({expr}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


#: The fold applied to the `text` column — interpolate THIS into DuckDB
#: oracle strings instead of hand-inlining the translate literal, so the
#: Spark-side contract (ascii_fold) and every oracle can't drift apart
#: (r12 ADVICE #2: ~25 inlined copies were one edit away from divergence).
SQL_FOLD_TEXT = sql_ascii_fold("text")


def sql_ws_split(expr: str) -> str:
    """DuckDB twin of ``F.split(expr, WS_RE)``: whitespace tokenization
    over the shared explicit class."""
    return f"string_split_regex({expr}, '{WS_RE}')"


#: Whitespace tokenization of the raw / ascii-folded `text` column — the
#: two oracle-side tokenizer idioms, single-sourced for the same
#: anti-drift reason as SQL_FOLD_TEXT.
SQL_SPLIT_TEXT = sql_ws_split("text")
SQL_SPLIT_FOLDED = sql_ws_split(SQL_FOLD_TEXT)
