"""Property-based tests for the wave-19 kernels against pure-Python oracles
on generated inputs.

The registry's DuckDB oracles prove engine/oracle agreement on the fixture;
these additionally prove the MECHANISMS on adversarial generated inputs:
the Bloom filter can never false-negative (its load-bearing guarantee in
q302/q306 -- a false negative silently loses contamination), the probe
kernel's ragged-batch reduction handles empty docs at any position, and the
consistent-hash ring moves keys only TO an added node for any node count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkstreaming_quickstart_spark.queries.wave19 import (
    _bloom_build,
    _bloom_probe_kernel,
    _ring_points,
)

_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_i64 = st.integers(-(2**63), 2**63 - 1)


@_SETTINGS
@given(
    eval_hashes=st.lists(_i64, min_size=0, max_size=200),
    docs=st.lists(st.lists(_i64, min_size=0, max_size=20), min_size=1, max_size=30),
)
def test_bloom_never_false_negatives(eval_hashes, docs):
    """Any doc sharing >=1 hash with the eval set MUST be flagged -- for
    arbitrary 64-bit hash values (sign bits, duplicates, zero) and docs of
    any shape including empty ones at any batch position."""
    bits = _bloom_build(eval_hashes)
    kernel = _bloom_probe_kernel(bits)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(docs), dtype=np.int64),
            "ghs": [np.asarray(d, dtype=np.int64) for d in docs],
        }
    )
    out = list(kernel(iter([pdf])))
    flagged = set(np.concatenate([o["doc_id"].to_numpy() for o in out])) if out else set()
    ev = set(eval_hashes)
    for i, d in enumerate(docs):
        if ev & set(d):
            assert i in flagged, f"false negative: doc {i} shares a hash but was not flagged"


@_SETTINGS
@given(
    eval_hashes=st.lists(_i64, min_size=1, max_size=50),
    extra=st.lists(_i64, min_size=0, max_size=50),
)
def test_bloom_membership_matches_scalar_recompute(eval_hashes, extra):
    """The vectorized kernel's membership verdict equals a scalar
    re-implementation of the same double-hash probes for every queried
    value (inserted or not)."""
    m, k = 1 << 20, 4
    bits = _bloom_build(eval_hashes, m, k)

    def scalar_member(h):
        u = np.uint64(np.int64(h).astype(np.uint64))
        h1 = int(u % np.uint64(m))
        delta = int((u >> np.uint64(32)) | np.uint64(1))
        for j in range(k):
            pos = (h1 + j * delta) % m
            if not (bits[pos // 8] >> (pos % 8)) & 1:
                return False
        return True

    queries = list(eval_hashes) + list(extra)
    kernel = _bloom_probe_kernel(bits, m, k)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(queries), dtype=np.int64),
            "ghs": [np.asarray([q], dtype=np.int64) for q in queries],
        }
    )
    out = list(kernel(iter([pdf])))
    flagged = set(np.concatenate([o["doc_id"].to_numpy() for o in out])) if out else set()
    for i, q in enumerate(queries):
        assert (i in flagged) == scalar_member(q)
    # every inserted value must test positive (no-false-negative again,
    # through the scalar path this time)
    for i in range(len(eval_hashes)):
        assert i in flagged


@_SETTINGS
@given(
    n_before=st.integers(1, 12),
    keys=st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=60),
)
def test_ring_growth_moves_keys_only_to_new_node(n_before, keys):
    """Adding node n_{N} to an N-node ring reassigns a key ONLY if its new
    shard is the added node -- the consistent-hashing contract, for any
    ring size and any key values (including keys above every ring point,
    which wrap)."""
    before, after = _ring_points(n_before), _ring_points(n_before + 1)

    def assign(pts, hv):
        idx = sum(1 for p, _ in pts if p < hv) % len(pts)
        return pts[idx][1]

    for hv in keys:
        a, b = assign(before, hv), assign(after, hv)
        if a != b:
            assert b == f"n{n_before}", (hv, a, b)


@_SETTINGS
@given(
    docs=st.lists(st.lists(_i64, min_size=0, max_size=15), min_size=1, max_size=40),
)
def test_simhash_kernel_matches_scalar_majority_vote(docs):
    """The Arrow SimHash kernel (unpackbits/reduceat/packbits, round-7 q53
    rewrite) equals the definitional per-bit majority vote for arbitrary
    64-bit token hashes, empty docs included, across the kernel's 256-row
    sub-batch boundary."""
    from sparkstreaming_quickstart_spark.operators.dedup import _simhash_fp_batches

    kernel = _simhash_fp_batches()
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(docs), dtype=np.int64),
            "th": [np.asarray(d, dtype=np.int64) for d in docs],
        }
    )
    got = pd.concat(list(kernel(iter([pdf])))).set_index("doc_id")["fp"].to_dict()

    def scalar_fp(hashes):
        fp = 0
        for b in range(64):
            s = sum(1 if (np.uint64(np.int64(h).astype(np.uint64)) >> np.uint64(b)) & np.uint64(1) else -1 for h in hashes)
            if s > 0:
                fp |= 1 << b
        # two's-complement view: bit 63 set -> negative int64
        return int(np.uint64(fp).astype(np.int64))
    for i, d in enumerate(docs):
        assert got[i] == scalar_fp(d), (i, d)
