"""Wave-19 semantic pins: Bloom-prefiltered decontamination (q302) must be
EXACTLY q139's contamination report (the Bloom stage is a pure candidate
reducer -- no false negatives by construction), and the BPE encode pass
(q303) must match an independent pure-Python greedy BPE train+encode."""

from __future__ import annotations

import pandas as pd


def _write_docs(path, texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 2}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(path / "documents.parquet")
    return str(path)


def test_bloom_decontaminate_equals_plain_join_decontaminate(spark, sf_dir):
    """q302 == q139 on (doc_id, n_shared): the Bloom prefilter must be
    invisible in the result (it only prunes candidates; the exact verify
    join decides)."""
    from sparkstreaming_quickstart_spark.queries.traindata import q139_decontaminate
    from sparkstreaming_quickstart_spark.queries.wave19 import (
        q302_bloom_decontaminate,
    )

    plain = {
        (r["doc_id"], r["n_shared"]) for r in q139_decontaminate(spark, sf_dir).collect()
    }
    bloom = {
        (r["doc_id"], r["n_shared"])
        for r in q302_bloom_decontaminate(spark, sf_dir).collect()
    }
    assert plain == bloom
    assert plain, "fixture should contain contaminated documents"


def test_bloom_decontaminate_planted_pair(spark, tmp_path):
    from sparkstreaming_quickstart_spark.queries.wave19 import (
        q302_bloom_decontaminate,
    )

    # doc 0 (doc_id % 97 == 0) is the eval doc; doc 100 shares exactly one
    # 4-gram window with it; doc 101 shares none.
    eval_doc = "alpha beta gamma delta epsilon"
    hit_doc = "x y alpha beta gamma delta z w"
    miss_doc = "p q r s t u v"
    sf = _write_docs(tmp_path, [eval_doc, hit_doc, miss_doc], ids=[0, 100, 101])
    rows = q302_bloom_decontaminate(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == 100
    # shared 4-grams: 'alpha beta gamma delta' only
    assert r["n_shared"] == 1
    assert r["n_grams"] == 5  # 8 tokens -> 5 windows
    assert abs(r["contamination_share"] - round(1 / 5, 6)) < 1e-9


def _py_bpe_train_encode(texts, levels):
    """Independent greedy word-BPE with the engines' exact splice semantics:
    the merge is a left-to-right non-overlapping replace of ' a b ' on the
    space-padded string (Python str.replace == Java/DuckDB replace), so two
    occurrences sharing a boundary space ('a b a b') merge only once --
    matching q270/q303, not an idealized token-list merger."""
    corpus = [f" {t} " for t in texts]
    for _ in range(levels):
        counts = {}
        for padded in corpus:
            toks = padded.split()
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        a, b = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[0]
        corpus = [p.replace(f" {a} {b} ", f" {a}+{b} ") for p in corpus]
    return [p.split() for p in corpus]


def test_bpe_encode_matches_python_reference(spark, tmp_path):
    from sparkstreaming_quickstart_spark.queries.wave19 import (
        _BPE_LEVELS,
        q303_bpe_encode,
    )

    texts = [
        "the cat sat on the mat",
        "the cat sat on the cat",
        "a cat sat here the cat sat",
        "the mat the cat sat on",
    ]
    sf = _write_docs(tmp_path, texts)
    rows = q303_bpe_encode(spark, sf).collect()
    encoded = _py_bpe_train_encode(texts, _BPE_LEVELS)
    by_source = {}
    for i, (t, enc) in enumerate(zip(texts, encoded)):
        src = f"s{i % 2}"
        st = by_source.setdefault(src, [0, 0, 0])
        st[0] += 1
        st[1] += len(t.split())
        st[2] += len(enc)
    assert len(rows) == len(by_source)
    for r in rows:
        n_docs, before, after = by_source[r["source"]]
        assert r["n_docs"] == n_docs
        assert r["tokens_before"] == before
        assert r["tokens_after"] == after, (
            r["source"],
            encoded,
        )
        assert abs(r["compression"] - round(after / before, 6)) < 1e-9
