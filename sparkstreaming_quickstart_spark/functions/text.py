"""Text-analysis expression helpers (all JVM-side, codegen-friendly).

Used by the LLM-data-pipeline queries over `documents`.  Everything here is a
pure Column expression -- no Python UDFs -- so the hot path stays inside
whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles as 'w1 w2 w3' strings.

    Built with a higher-order `transform` over token indices -- no explode, so
    it composes inside a single projection.
    """
    t = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def avg_token_len(text: Column | str) -> Column:
    """Mean token length = (chars - separators) / tokens, exact int division."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    total = F.length(c) - (n - 1)  # remove the single-space separators
    return total.cast("double") / n


def token_chunks(text: Column | str, window: int = 32, stride: int = 24) -> Column:
    """Sliding token-window chunks: array of (chunk_start, chunk_text) structs.

    The chunking step of a training-data pipeline (split long documents into
    overlapping context windows).  `chunk_start` is the 1-based token index;
    the final chunk may be shorter than `window`.  One expression, no explode
    and no Python — the caller explodes once to get a row per chunk, so a
    100 TB corpus chunks in a single narrow (shuffle-free) projection.
    """
    t = tokens(text)
    starts = F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(stride))
    return F.transform(
        starts,
        lambda st: F.struct(
            st.alias("chunk_start"),
            F.concat_ws(" ", F.slice(t, st, window)).alias("chunk_text"),
            F.size(F.slice(t, st, window)).alias("n_chunk_tokens"),
        ),
    )


def ngram_instances(toks: Column | str, n: int = 3) -> Column:
    """ALL n-gram instances (duplicates kept, unlike word_shingles) over a
    TOKEN-ARRAY column, as 'w1 .. wn' strings; arrays shorter than n yield
    an empty array, so a following explode drops those rows.  One guarded
    transform -- no Python, composes inside a single projection.  Callers
    starting from raw text pass `tokens(text_col)`."""
    t = F.col(toks) if isinstance(toks, str) else toks
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
