"""Round-14 pins: the arrays_zip spellings of word_shingles /
ngram_instances are value-IDENTICAL to the per-window-lambda spellings they
replaced (which re-evaluated the token subtree once per window -- O(tokens^2)
per document; measured 31 s -> ~2 s for q375's shingle+md5 projection at sf1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_quickstart_spark.functions.text import (
    ngram_instances,
    tokens,
    word_shingles,
)
from sparkstreaming_quickstart_spark.sources.catalog import load_table


def _old_word_shingles(text, n):
    t = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )


def _old_ngram_instances(t, n):
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


_EDGE_TEXTS = [
    "",  # filtered upstream in queries, but the expression must still agree
    "one",
    "one two",
    "one two three",
    "one two three four",
    "a a a a a a",  # duplicate shingles -> array_distinct path
    "x  y",  # double space -> empty token
]


def _frame(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edges = spark.createDataFrame(
        [(10_000_000 + i, t) for i, t in enumerate(_EDGE_TEXTS)], "doc_id long, text string"
    )
    return d.unionAll(edges)


def test_word_shingles_spelling_identical(spark, sf_dir):
    d = _frame(spark, sf_dir)
    for n in (2, 3, 4):
        diff = d.select(
            "doc_id",
            word_shingles("text", n).alias("new"),
            _old_word_shingles("text", n).alias("old"),
        ).filter(F.col("new") != F.col("old"))
        assert diff.count() == 0, diff.limit(5).collect()


def test_ngram_instances_spelling_identical(spark, sf_dir):
    d = _frame(spark, sf_dir)
    for n in (2, 3, 5):
        diff = d.select(
            "doc_id",
            ngram_instances(tokens("text"), n).alias("new"),
            _old_ngram_instances(tokens("text"), n).alias("old"),
        ).filter(F.col("new") != F.col("old"))
        assert diff.count() == 0, diff.limit(5).collect()
