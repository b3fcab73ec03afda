"""Text-analysis column helpers for the training-data pipeline operators.

All JVM-side (split/filter/transform/regexp) — no Python in the hot path.
Token model: whitespace split (reference tokenizes externally and counts
words with ``split``-like semantics, e.g. Snakefile:1704-1712 word counts,
bitextor_elrc_filtering.py:60-65 token counts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# "stopwords" for the language-ID heuristic: high-frequency function words.
# On synthetic corpora these are simply the most frequent tokens; the
# heuristic (stopword density ⇒ language match) is the standard n-gram/
# function-word LID trick.
EN_STOPWORDS = (
    "a", "the", "of", "and", "to", "in", "is", "on", "for", "it",
    "key", "row", "table", "value", "data", "query",
)


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def stopword_count(col: Column) -> Column:
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    return F.size(
        F.filter(tokens(col), lambda t: F.array_contains(stops, F.lower(t)))
    ).cast("bigint")


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (0-based element_at via transform over indices).

    Docs with fewer than ``n`` tokens (and NULL/empty text) yield an EMPTY
    array — matching the oracle's ``generate_series(1, greatest(len-n+1,
    0))``. The guard must be a lazy ``when``: the former
    ``sequence(0, greatest(size-n, -1))`` form emitted the DESCENDING
    sequence ``[0, -1]`` for short docs (``sequence`` infers a negative
    step when start > stop), and ``element_at`` then raised
    INVALID_ARRAY_INDEX under ANSI mode on any real-world short document.
    """
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def normalized_text(col: Column) -> Column:
    """Fingerprint normalization: lowercase, strip punctuation, collapse
    whitespace (F11/F12/F14 semantics)."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def xml_escape(col: Column) -> Column:
    """F17: XML 1.0 predefined-entity escaping, & first (the reference's
    xml.sax.saxutils.escape + quote handling in bitextor_build_TMX.py).
    Replacement ORDER is the semantics — mirrored verbatim in oracle SQL."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    for raw, ent in (("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;"), ("'", "&apos;")):
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out
