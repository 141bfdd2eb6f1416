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


def test_bpe_encode_degenerate_single_token_corpus(spark, tmp_path):
    """Every non-empty doc is a single token: no adjacent pair exists, so
    training finds nothing to merge and the encode must be the identity in
    BOTH engines (Spark guards the empty argmax collect; the oracle's CASE
    guard makes the no-pairs level a no-op).  Regression for the round-7
    advice finding: the unguarded collect()[0] raised IndexError while the
    oracle's scalar subquery nulled the text."""
    from sparkstreaming_quickstart_spark.oracle import compare
    from sparkstreaming_quickstart_spark.queries import oracle_sql
    from sparkstreaming_quickstart_spark.queries.wave19 import q303_bpe_encode

    sf = _write_docs(tmp_path, ["alpha", "beta", "gamma", "alpha"])
    rows = q303_bpe_encode(spark, sf).collect()
    assert rows, "degenerate corpus must still produce per-source rows"
    for r in rows:
        assert r["tokens_after"] == r["tokens_before"]
        assert r["compression"] == 1.0
    res = compare(spark, sf, q303_bpe_encode, oracle_sql()["q303_bpe_encode"])
    assert res["ok"], res


def test_dp_histogram_noise_matches_hashlib_replay(spark, tmp_path):
    import hashlib
    import math

    from sparkstreaming_quickstart_spark.queries.wave19 import (
        _DP_EPS,
        _DP_SALT,
        q304_dp_histogram,
    )

    texts = ["w1 w2", "w3 w4", "w5"]
    pd.DataFrame(
        {
            "doc_id": range(3),
            "text": texts,
            "lang": ["en", "en", "de"],
            "source": ["s0", "s0", "s1"],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {(r["lang"], r["source"]): r for r in q304_dp_histogram(spark, str(tmp_path)).collect()}
    assert rows[("en", "s0")]["n_true"] == 2
    assert rows[("de", "s1")]["n_true"] == 1
    for (lang, src), r in rows.items():
        h = int(hashlib.md5(f"{_DP_SALT}{lang}|{src}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        lap = (1.0 if u < 0.5 else -1.0) * (1.0 / _DP_EPS) * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert abs(r["n_noisy"] - round(r["n_true"] + lap, 6)) < 1e-9


def test_consistent_ring_moves_only_to_new_node(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave19 import (
        q305_consistent_hash_ring,
    )

    rows = q305_consistent_hash_ring(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    moved = sum(r["n_docs"] for r in rows if r["moved"])
    # consistent-hashing contract: keys only ever move TO the added node
    assert all(r["shard_after"] == "n8" for r in rows if r["moved"])
    # and roughly 1/9 of them (vnode variance allows a loose band)
    assert 0.02 < moved / total < 0.30, moved / total


def test_consistent_ring_assignment_matches_hashlib(spark, tmp_path):
    import hashlib

    from sparkstreaming_quickstart_spark.queries.wave19 import (
        _ring_points,
        q305_consistent_hash_ring,
    )

    ids = [0, 7, 12345, 999999]
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": ["x"] * len(ids),
            "lang": ["en"] * len(ids),
            "source": ["s0"] * len(ids),
            "n_chars": [1] * len(ids),
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = q305_consistent_hash_ring(spark, str(tmp_path)).collect()

    def assign(pts, hv):
        idx = sum(1 for p, _ in pts if p < hv) % len(pts)
        return pts[idx][1]

    r8, r9 = _ring_points(8), _ring_points(9)
    expected = {}
    for i in ids:
        hv = int(hashlib.md5(f"doc|{i}".encode()).hexdigest()[:8], 16)
        key = (assign(r8, hv), assign(r9, hv))
        expected[key] = expected.get(key, 0) + 1
    got = {(r["shard_before"], r["shard_after"]): r["n_docs"] for r in rows}
    assert got == expected


def test_pipeline_v3_funnel_is_monotone_and_consistent(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave19 import (
        q306_corpus_pipeline_v3,
    )

    rows = q306_corpus_pipeline_v3(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_input"] >= r["n_quality"] >= r["n_decontaminated"] >= r["n_final"]
        assert r["n_final"] >= 0
        # token mass only counts final survivors
        if r["n_final"] == 0:
            assert r["tokens_final"] == 0
        else:
            assert r["tokens_final"] > 0
    # at least one stage must actually filter something on the fixture
    assert sum(r["n_input"] for r in rows) > sum(r["n_final"] for r in rows)


def test_matryoshka_eval_matches_numpy(spark, tmp_path_factory):
    import numpy as np

    from sparkstreaming_quickstart_spark.queries.wave19 import (
        _MRL_DIMS,
        q307_matryoshka_eval,
    )

    rng = np.random.default_rng(31)
    X = rng.normal(size=(150, 64))
    pdf = pd.DataFrame(
        {
            "vec_id": range(150),
            "embedding": [np.asarray(v, dtype="float32") for v in X],
            "label": [0] * 150,
        }
    )
    d = tmp_path_factory.mktemp("emb")
    pdf.to_parquet(d / "embeddings.parquet")
    rows = {r["kept_dims"]: r for r in q307_matryoshka_eval(spark, str(d)).collect()}
    assert set(rows) == set(_MRL_DIMS)

    Xd = X.astype(np.float32).astype(np.float64)
    nrm = np.linalg.norm(Xd, axis=1)
    cos = np.round((Xd @ Xd.T) / np.outer(nrm, nrm), 9)
    pairs = []
    for qi in range(0, 150, 50):
        order = sorted((i for i in range(150) if i != qi), key=lambda i: (-cos[qi, i], i))
        pairs += [(qi, ni) for ni in order[:5]]
    for nd in _MRL_DIMS:
        T = Xd[:, :nd]
        tn = np.linalg.norm(T, axis=1)
        tcos = np.round((T @ T.T) / np.outer(tn, tn), 9)
        deltas = [abs(tcos[a, b] - cos[a, b]) for a, b in pairs]
        r = rows[nd]
        assert r["n_pairs"] == len(pairs)
        assert abs(r["mean_abs_delta"] - round(float(np.mean(deltas)), 6)) < 2e-6
        # full-dim truncation is the identity: delta exactly 0
        if nd == 64:
            assert r["mean_abs_delta"] == 0.0
