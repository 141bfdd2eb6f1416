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

    Built with a higher-order `transform` -- no explode, so it composes
    inside a single projection.

    Round-14 spelling (guide §4 / measured 31 s -> 2 s for the q375 shingle
    projection at sf1): Spark does NO common-subexpression elimination
    inside lambda bodies, so the old `transform(sequence(...), i ->
    concat_ws(slice(tokens(text), i+1, n)))` re-evaluated the whole
    `split(text)` once PER WINDOW POSITION -- O(tokens^2) work per document.
    This spelling zips n SHIFTED slices of the token array (each slice
    evaluates the split subtree once per ROW) and concatenates the zipped
    struct fields, so per-document work is O(n x tokens).  Output is
    IDENTICAL: window i's struct holds t[i+1..i+n] with arrays_zip null-
    padding the tail windows, and concat_ws skips NULLs exactly like the
    old short-tail slice join; docs shorter than n tokens still yield the
    single whole-doc shingle (m = max(size-n+1, 1)); pinned old-vs-new in
    tests/test_text_spellings.py."""
    t = tokens(text)
    m = F.greatest(F.size(t) - (n - 1), F.lit(1))
    z = F.arrays_zip(*[F.slice(t, k + 1, m).alias(f"w{k}") for k in range(n)])
    return F.array_distinct(
        F.transform(z, lambda s: F.concat_ws(" ", *[s[f"w{k}"] for k in range(n)]))
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
    # Same no-CSE-inside-lambdas fix as word_shingles (round 14): the old
    # `slice(t, i, n)` lambda re-evaluated the token subtree per window.
    # Here size >= n guarantees every slice is exactly m long (k+m <= size),
    # so no null padding ever occurs.
    m = F.size(t) - (n - 1)
    z = F.arrays_zip(*[F.slice(t, k + 1, m).alias(f"w{k}") for k in range(n)])
    return F.when(
        F.size(t) >= n,
        F.transform(z, lambda s: F.concat_ws(" ", *[s[f"w{k}"] for k in range(n)])),
    ).otherwise(F.array().cast("array<string>"))
