"""Wave-38 tests: winnowing fingerprints (q379), dictionary tagging (q380),
perceptual dHash (q381).

Each operator's kernel is pinned against an independent pure-Python
reference, plus the structural property its oracle compare rides on
(winnowing's detection guarantee; replace-diff == str.count; the Hamming
pigeonhole over dHash bands).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Independent robust-winnowing reference: returns the selected
    (hash, pos) set, pos 1-based, rightmost-minimal per window."""
    import re

    t = re.sub(r"\s+", " ", text).strip().lower()
    n = len(t)
    if n < k + w - 1:
        return set()
    hs = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:10], 16)
        for i in range(n - k + 1)
    ]
    out: set[tuple[int, int]] = set()
    for s in range(len(hs) - w + 1):
        best_h, best_p = None, None
        for j in range(s, s + w):
            if best_h is None or hs[j] < best_h or (hs[j] == best_h and j > best_p):
                best_h, best_p = hs[j], j
        out.add((best_h, best_p + 1))
    return out


def test_winnow_spark_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.operators.dedup import winnow_fingerprints
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(40)
    got = (
        winnow_fingerprints(d, "text", "doc_id")
        .toPandas()
        .groupby("id")
        .apply(lambda g: set(zip(g["h"], g["pos"])), include_groups=False)
        .to_dict()
    )
    for row in d.select("doc_id", "text").collect():
        want = _py_winnow(row["text"], 8, 16)
        assert got.get(row["doc_id"], set()) == want, row["doc_id"]


@settings(max_examples=25, deadline=None)
@given(
    left=st.text(alphabet="abcdef gh", min_size=0, max_size=60),
    right=st.text(alphabet="abcdef gh", min_size=0, max_size=60),
    shared=st.text(alphabet="xyzw", min_size=23, max_size=40),
)
def test_winnowing_detection_guarantee(left, right, shared):
    """The winnowing theorem: two texts sharing a substring of length
    >= w + k - 1 (= 23 at k=8, w=16) share at least one fingerprint hash.
    The shared block uses a disjoint alphabet so the guarantee is exercised
    on the planted match, not an accidental one."""
    a = f"{left}{shared}{left}"
    b = f"{right}{shared}{right}"
    fa = {h for h, _ in _py_winnow(a, 8, 16)}
    fb = {h for h, _ in _py_winnow(b, 8, 16)}
    assert fa & fb


@settings(max_examples=40, deadline=None)
@given(
    text=st.text(alphabet="ab c", min_size=0, max_size=50),
    term=st.text(alphabet="ab c", min_size=1, max_size=5),
)
def test_replace_diff_equals_str_count(text, term):
    """q380's occurrence kernel: the replace-diff identity equals Python's
    non-overlapping left-to-right str.count for every (text, term)."""
    occ = (len(text) - len(text.replace(term, ""))) // len(term)
    assert occ == text.count(term)


def test_dictionary_tagging_values(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave38 import (
        _DICT,
        q380_dictionary_tagging,
    )

    got = q380_dictionary_tagging(spark, sf_dir).toPandas().set_index("term")
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
    for term, cat in _DICT:
        counts = texts.map(lambda t: t.count(term))  # noqa: B023
        assert got.loc[term, "category"] == cat
        assert got.loc[term, "n_docs"] == int((counts > 0).sum())
        assert got.loc[term, "total_occ"] == int(counts.sum())
        assert got.loc[term, "max_occ"] == int(counts.max())


def _py_dhash_bands(payload: bytes) -> list[int]:
    px = np.frombuffer(payload[:72].ljust(72, b"\0"), dtype=np.uint8).astype(int)
    grid = px.reshape(8, 9)
    bits = (grid[:, :-1] < grid[:, 1:]).reshape(64)
    return [
        int(sum(int(bits[16 * b + r]) << r for r in range(16))) for b in range(4)
    ]


def test_dhash_kernel_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.operators.multimodal import (
        dhash_bands,
        with_binary_payload,
    )
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    got = (
        dhash_bands(with_binary_payload(d, "text"))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for row in d.select("doc_id", "text").collect():
        want = _py_dhash_bands(row["text"].encode())
        assert list(got.loc[row["doc_id"], ["b0", "b1", "b2", "b3"]]) == want


@settings(max_examples=30, deadline=None)
@given(
    base=st.binary(min_size=0, max_size=90),
    flips=st.lists(st.integers(min_value=0, max_value=71), max_size=3),
)
def test_dhash_band_pigeonhole(base, flips):
    """Hamming distance <= 3 over the 64 bits forces at least one of the 4
    16-bit bands equal (the candidate-generation completeness argument):
    perturb up to 3 PIXELS and check band equality wherever hamming <= 3."""
    a = bytearray(base[:72].ljust(72, b"\0"))
    b = bytearray(a)
    for f in flips:
        b[f] = (b[f] + 97) % 256
    ba, bb = _py_dhash_bands(bytes(a)), _py_dhash_bands(bytes(b))
    ham = sum(bin(x ^ y).count("1") for x, y in zip(ba, bb))
    if ham <= 3:
        assert any(x == y for x, y in zip(ba, bb))


def test_winnowing_pairs_rank_planted_neardups(spark, sf_dir):
    """End-to-end sanity on the fixture: q379's top shared-fingerprint pair
    must be a genuine near-dup (3-token-shingle Jaccard > 0.7)."""
    from sparkstreaming_quickstart_spark.queries.wave38 import (
        q379_winnowing_neardup,
    )

    pairs = q379_winnowing_neardup(spark, sf_dir).toPandas()
    if pairs.empty:
        pytest.skip("no pairs above threshold at this SF")
    top = pairs.sort_values("n_shared", ascending=False).iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")["text"]

    def sh(t):
        toks = t.split()
        return {tuple(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}

    s1, s2 = sh(docs[top["d1"]]), sh(docs[top["d2"]])
    assert len(s1 & s2) / len(s1 | s2) > 0.7


def test_neardup_safe_split_invariants(spark, sf_dir):
    """q382: cluster_safe must ship ZERO leaked near-dup pairs (both
    endpoints hash the same representative), the naive per-doc split must
    leak on the fixture's planted near-dups, and each scheme's split sizes
    must partition the corpus."""
    from sparkstreaming_quickstart_spark.queries.wave38 import (
        q382_neardup_safe_split,
    )

    got = q382_neardup_safe_split(spark, sf_dir).toPandas().set_index("scheme")
    n_docs = pd.read_parquet(f"{sf_dir}/documents.parquet").shape[0]
    for scheme in ("naive", "cluster_safe"):
        row = got.loc[scheme]
        assert row["n_train"] + row["n_val"] + row["n_test"] == n_docs
    assert got.loc["cluster_safe", "leaked_pairs"] == 0
    assert got.loc["naive", "leaked_pairs"] > 0
    # both schemes see the same cluster structure
    assert got.loc["naive", "n_clusters"] == got.loc["cluster_safe", "n_clusters"]


@settings(max_examples=40, deadline=None)
@given(
    text=st.text(alphabet="aelmnorstuwy bcdfgh", min_size=0, max_size=150),
)
def test_aho_corasick_counts_equal_str_count(text):
    """q383's kernel: the failure-link automaton's non-overlapping counts
    must equal str.count for every term simultaneously -- including terms
    that are substrings/suffixes of each other and self-overlapping terms."""
    from sparkstreaming_quickstart_spark.operators.text_scan import AhoCorasick

    terms = ["window", "table scan", "an", "scan", "aa", "aaa", "s", "stream"]
    ac = AhoCorasick(terms)
    assert ac.count_nonoverlapping(text) == [text.count(t) for t in terms]


def test_dictionary_automaton_equals_codegen_twin(spark, sf_dir):
    """q383 must produce EXACTLY q380's output (the value-locked pair)."""
    from sparkstreaming_quickstart_spark.queries.wave38 import (
        q380_dictionary_tagging,
        q383_dictionary_scan_automaton,
    )

    a = q380_dictionary_tagging(spark, sf_dir).toPandas()
    b = q383_dictionary_scan_automaton(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_filter_attribution_invariants(spark, sf_dir):
    """q384: per-rule uniques must sum to the __any__ row's n_unique, every
    rule's n_unique <= n_failed, the union kill count is bounded by the sum
    of per-rule kills (inclusion-exclusion direction), and the whole report
    replays against a pandas reference."""
    from sparkstreaming_quickstart_spark.queries.wave38 import (
        _FA_DISTINCT,
        _FA_FLAG,
        _FA_SHORT_TOK,
        _FA_WLEN,
        q384_filter_attribution,
    )

    got = q384_filter_attribution(spark, sf_dir).toPandas().set_index("rule")
    rules = ["r_flagged", "r_long_words", "r_repetitive", "r_short"]
    assert got.loc[rules, "n_unique"].sum() == got.loc["__any__", "n_unique"]
    assert (got["n_unique"] <= got["n_failed"]).all()
    assert got.loc[rules, "n_failed"].sum() >= got.loc["__any__", "n_failed"]

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs["text"].str.split(" ")
    f = pd.DataFrame(
        {
            "r_short": toks.map(len) < _FA_SHORT_TOK,
            "r_repetitive": toks.map(lambda t: len(set(t)) / len(t)) < _FA_DISTINCT,
            "r_long_words": toks.map(lambda t: sum(map(len, t)) / len(t)) > _FA_WLEN,
            "r_flagged": docs["text"].str.contains(_FA_FLAG, regex=False),
        }
    )
    n_rules = f.sum(axis=1)
    for rule in rules:
        assert got.loc[rule, "n_failed"] == int(f[rule].sum()), rule
        assert got.loc[rule, "n_unique"] == int((f[rule] & (n_rules == 1)).sum()), rule
    assert got.loc["__any__", "n_failed"] == int((n_rules > 0).sum())


def test_ivf_probe_scan_is_partition_pruned(spark, sf_dir):
    """q385's plan pin: the layout scan must consume the probed-cell list as
    a PartitionFilter (directory pruning) with no data filter left on the
    partition column -- the property that bounds an ANN probe to its shards."""
    import re

    from sparkstreaming_quickstart_spark.queries.wave38 import (
        _ivf_partitioned_dir,
        q385_ivf_partition_pruned_probe,
    )

    out = q385_ivf_partition_pruned_probe(spark, sf_dir)
    assert out.count() > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    layout = [l for l in scans if "ssq-emb-ivf-" in l]
    assert layout, scans
    m = re.search(r"PartitionFilters: \[([^\]]*)", layout[0])
    assert m and "cell" in m.group(1), layout[0]
    dm = re.search(r"DataFilters: \[([^\]]*)", layout[0])
    assert dm and "cell" not in dm.group(1), layout[0]
    # and the probe really prunes at this SF: fewer dirs read than cells exist
    part_dir = _ivf_partitioned_dir(spark, sf_dir)
    import os as _os

    n_cells_on_disk = len(
        [d for d in _os.listdir(part_dir) if d.startswith("cell=")]
    )
    probed = re.findall(r"cell#\d+ IN \(([^)]*)\)", m.group(1))
    if probed:
        assert len(probed[0].split(",")) < n_cells_on_disk


def test_documents_text_is_pure_ascii_at_every_sf():
    """q381's value oracle replays dHash payload bytes with per-character
    ascii(substr(text, ...)) while the Spark kernel hashes UTF-8 bytes;
    the two agree ONLY while documents.text is pure ASCII.  Pin that
    fixture property at every driver SF (round-10 advice) so a fixture
    regen with a non-ASCII vocab fails HERE, not as a silent oracle
    value mismatch.  (tools/gen_sf.py asserts the same property at
    generation time for the /tmp scale fixtures.)"""
    import os

    import duckdb

    checked = 0
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        bad = (
            duckdb.connect()
            .execute(
                f"SELECT count(*) FROM '{path}' "
                "WHERE regexp_matches(text, '[^\\x00-\\x7F]')"
            )
            .fetchone()[0]
        )
        assert bad == 0, f"sf{sf}: {bad} documents with non-ASCII text"
        checked += 1
    assert checked > 0


@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=0, max_size=8
    ),
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=5),
        min_size=1,
        max_size=6,
        unique=True,
    ),
)
@settings(max_examples=60, deadline=None)
def test_dense_automaton_equals_classic(texts, terms):
    """AhoCorasickDense (the vectorized lockstep-batch DFA, round-11) must
    produce byte-identical per-term non-overlapping counts to the classic
    per-char automaton -- which itself is pinned to str.count above."""
    from sparkstreaming_quickstart_spark.operators.text_scan import (
        AhoCorasick,
        AhoCorasickDense,
    )

    classic = AhoCorasick(terms)
    dense = AhoCorasickDense(terms)
    got = dense.count_batch(texts)
    want = [classic.count_nonoverlapping(t) for t in texts]
    assert got == want


@given(
    st.lists(
        st.text(alphabet="abéλ 中", min_size=0, max_size=40),
        min_size=0,
        max_size=6,
    ),
    st.lists(
        st.text(alphabet="abéλ中", min_size=1, max_size=4),
        min_size=1,
        max_size=5,
        unique=True,
    ),
)
@settings(max_examples=60, deadline=None)
def test_dense_automaton_non_ascii(texts, terms):
    """Non-ASCII dictionaries: the dense DFA is built from the terms' UTF-8
    BYTES (round-11 advice -- a char-keyed build gave silent 0 counts for
    codepoints 128-255 and IndexError above), so 2- and 3-byte codepoints
    must count exactly like str.count."""
    from sparkstreaming_quickstart_spark.operators.text_scan import (
        AhoCorasickDense,
    )

    dense = AhoCorasickDense(terms)
    got = dense.count_batch(texts)
    want = [[t.count(term) for term in terms] for t in texts]
    assert got == want
