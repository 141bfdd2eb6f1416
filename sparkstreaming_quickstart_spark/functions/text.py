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
