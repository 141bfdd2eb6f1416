"""Deterministic scale-factor fixture generator (round 9).

The driver-provided fixtures stop at sf0.1 (`/root/testdata`, read-only).
Scaling experiments above that (the sf1 spot-sweep, scaling-exponent
measurements in SCALING.md) need bigger tables with the same shape, so this
tool synthesizes them OUTSIDE the protected tree:

    python tools/gen_sf.py 1.0 /tmp/sfgen/sf1

Design: distributions are matched to the sf0.1 fixtures by construction --
value-like columns are BOOTSTRAP-RESAMPLED (with replacement, seeded) from
the real sf0.1 rows so every marginal matches exactly, while keys are
re-drawn dense at the target cardinality (customer/part/supplier/orders keys
sequential; foreign keys uniform over the new key space, preserving the
fixtures' uniform FK layout).  Fixture invariants that queries rely on are
reproduced explicitly:

- events: microsecond-UNIQUE timestamps over the same 30-day window,
  ts-sorted by event_id (streaming replay order), value ~ the empirical
  distribution, props = '{"k": <0..99>}'.
- documents: 10-100 tokens from a Zipf-distributed ~10k-type vocabulary
  whose head ranks are the driver fixtures' 30 words (round-10 change: the
  31-type corpus vocab made candidate-pair streams quadratic at sf>=1 from
  fixture degeneracy alone -- see SCALING.md), source = src{doc_id % 20},
  lang ~ the empirical mix, ~5%% of docs carry the 'dup' marker token, ~2%%
  are near-copies (one token perturbed) and ~0.2%% exact copies of earlier
  docs -- giving the LSH/dedup family a pair stream that scales linearly.
- embeddings: unit-normalized float32[64] around 10 cluster centers with
  mild anisotropy (fixture spectrum: lambda in [0.0065, 0.028]), ~1%%
  near-identical planted pairs for the cosine-dedup family.

Row counts scale linearly with sf (sf0.1 counts x 10 at sf1), matching
TESTDATA.md's documented ~10x-per-step ladder.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
BASE_SF = 0.1

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]

# Round-10 de-degeneration (round-9 verdict #3): the driver fixtures'
# 31-type corpus vocabulary makes EVERY posting list / shingle bucket
# corpus-sized, so at sf>=1 the exact-Jaccard oracles and candidate-pair
# streams of the q52/q53/q222/q322/q359 family blow up quadratically on
# fixture degeneracy rather than engine cost.  Generated fixtures instead
# draw tokens from a ZIPF-DISTRIBUTED vocabulary of ~10k types: the 30
# real words above stay as the head ranks (so driver-fixture tokens remain
# a subset and head words still behave like stop-words -- with ~55 tokens
# per doc the top ~10 ranks exceed 50% document frequency, exercising
# q222's df-prune realistically), and the tail is deterministic synthetic
# types.  Planted dup structure ('dup' marker, near/exact copies) is
# unchanged, so the LSH pair stream still scales linearly.
VOCAB_N = 10_000
VOCAB_ZIPF_S = 1.05


def _zipf_vocab() -> tuple[np.ndarray, np.ndarray]:
    """(words, probabilities): rank-r probability ~ 1/r^s over VOCAB_N types;
    head ranks are the 30 real VOCAB words, tail is w00030..w09999."""
    words = np.array(VOCAB + [f"w{i:05d}" for i in range(len(VOCAB), VOCAB_N)])
    ranks = np.arange(1, VOCAB_N + 1, dtype=np.float64)
    p = 1.0 / ranks**VOCAB_ZIPF_S
    return words, p / p.sum()
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]


def _read(table: str) -> pa.Table:
    return pq.read_table(os.path.join(BASE, f"{table}.parquet"))


def _resample(tbl: pa.Table, cols: list[str], n: int, rng) -> dict[str, np.ndarray]:
    """Jointly bootstrap-resample `cols` (row-aligned) from the base table."""
    idx = rng.integers(0, tbl.num_rows, size=n)
    out = {}
    for c in cols:
        out[c] = tbl.column(c).to_numpy(zero_copy_only=False)[idx]
    return out


def gen(sf: float, out_dir: str, seed: int = 421) -> None:
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / BASE_SF
    rng = np.random.default_rng(seed)

    def write(name: str, data: dict, schema: pa.Schema | None = None) -> None:
        t = pa.table(data, schema=schema)
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"  {name}: {t.num_rows} rows")

    # dimension tables: copy verbatim (fixed domains at every sf)
    for name in ("region", "nation"):
        pq.write_table(_read(name), os.path.join(out_dir, f"{name}.parquet"))
        print(f"  {name}: copied")

    base_supplier = _read("supplier")
    n_supp = int(base_supplier.num_rows * scale)
    s = _resample(base_supplier, ["s_nationkey", "s_acctbal"], n_supp, rng)
    write(
        "supplier",
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": s["s_nationkey"].astype(np.int32),
            "s_acctbal": s["s_acctbal"],
        },
    )

    base_cust = _read("customer")
    n_cust = int(base_cust.num_rows * scale)
    c = _resample(base_cust, ["c_nationkey", "c_acctbal", "c_mktsegment"], n_cust, rng)
    write(
        "customer",
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": c["c_nationkey"].astype(np.int32),
            "c_acctbal": c["c_acctbal"],
            "c_mktsegment": c["c_mktsegment"],
        },
    )

    base_part = _read("part")
    n_part = int(base_part.num_rows * scale)
    p = _resample(
        base_part, ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"], n_part, rng
    )
    write(
        "part",
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": p["p_name"],
            "p_brand": p["p_brand"],
            "p_type": p["p_type"],
            "p_size": p["p_size"].astype(np.int32),
            "p_retailprice": p["p_retailprice"],
        },
    )

    base_orders = _read("orders")
    n_ord = int(base_orders.num_rows * scale)
    o = _resample(
        base_orders,
        ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
        n_ord,
        rng,
    )
    write(
        "orders",
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, size=n_ord),
            "o_orderstatus": o["o_orderstatus"],
            "o_totalprice": o["o_totalprice"],
            "o_orderdate": o["o_orderdate"].astype("datetime64[us]"),
            "o_orderpriority": o["o_orderpriority"],
        },
    )

    base_li = _read("lineitem")
    n_li = int(base_li.num_rows * scale)
    li = _resample(
        base_li,
        [
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ],
        n_li,
        rng,
    )
    write(
        "lineitem",
        {
            "l_orderkey": rng.integers(0, n_ord, size=n_li),
            "l_partkey": rng.integers(0, n_part, size=n_li),
            "l_suppkey": rng.integers(0, n_supp, size=n_li),
            "l_linenumber": li["l_linenumber"].astype(np.int32),
            "l_quantity": li["l_quantity"],
            "l_extendedprice": li["l_extendedprice"],
            "l_discount": li["l_discount"],
            "l_tax": li["l_tax"],
            "l_returnflag": li["l_returnflag"],
            "l_linestatus": li["l_linestatus"],
            "l_shipdate": li["l_shipdate"].astype("datetime64[us]"),
        },
    )

    # events: unique-microsecond timestamps over the fixtures' 30-day
    # window, sorted by event_id (replay order), empirical value dist.
    base_ev = _read("events")
    n_ev = int(base_ev.num_rows * scale)
    window_us = 30 * 86400 * 1_000_000
    slot = window_us // n_ev
    ts_us = (
        np.arange(n_ev, dtype=np.int64) * slot
        + rng.integers(0, max(slot, 1), size=n_ev)
        + np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    )
    ev = _resample(base_ev, ["event_type", "value"], n_ev, rng)
    n_users = int(1500 * scale)
    write(
        "events",
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": ts_us.astype("datetime64[us]"),
            "user_id": rng.integers(0, n_users, size=n_ev),
            "event_type": ev["event_type"],
            "value": ev["value"],
            "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n_ev)],
        },
    )

    # documents: Zipf ~10k-type vocab (head = the 30 driver-fixture words),
    # planted dup structure unchanged
    n_doc = int(5000 * scale)
    lang = rng.choice(LANGS, p=LANG_P, size=n_doc)
    texts: list[str] = []
    vocab, vocab_p = _zipf_vocab()
    ntoks = rng.integers(10, 101, size=n_doc)
    flat = vocab[
        rng.choice(len(vocab), p=vocab_p, size=int(ntoks.sum()))
    ]
    pos = 0
    for i in range(n_doc):
        ntok = int(ntoks[i])
        toks = list(flat[pos : pos + ntok])
        pos += ntok
        if rng.random() < 0.05:
            toks[int(rng.integers(0, ntok))] = "dup"
        texts.append(" ".join(toks))
    # near-copies (one token perturbed) and exact copies of earlier docs
    for i in range(1, n_doc):
        r = rng.random()
        if r < 0.002:
            texts[i] = texts[int(rng.integers(0, i))]
        elif r < 0.022:
            src = texts[int(rng.integers(0, i))].split(" ")
            src[int(rng.integers(0, len(src)))] = "dup"
            texts[i] = " ".join(src)
    # q381's byte-level oracle (ascii(substr(...)) per char) equals Spark's
    # UTF-8 byte hashing ONLY while text is pure ASCII; pin the property at
    # generation time so a vocab change can't silently break the parity
    # (round-10 advice).
    for t in texts:
        t.encode("ascii", "strict")
    write(
        "documents",
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": lang,
            "source": [f"src{i % 20}" for i in range(n_doc)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        },
    )

    # embeddings: unit float32[64], 10 mild clusters, ~1% planted near-pairs
    n_vec = int(2000 * scale)
    d = 64
    centers = rng.normal(0.0, 1.0, size=(10, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, 10, size=n_vec)
    X = centers[label] * 0.65 + rng.normal(0.0, 1.0, size=(n_vec, d)) / np.sqrt(d) * 0.9
    dup_mask = rng.random(n_vec) < 0.01
    dup_src = rng.integers(0, n_vec, size=n_vec)
    X[dup_mask] = X[dup_src[dup_mask]] + rng.normal(0, 0.01, size=(dup_mask.sum(), d))
    label[dup_mask] = label[dup_src[dup_mask]]
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb = pa.array(list(X.astype(np.float32)), type=pa.list_(pa.float32()))
    write(
        "embeddings",
        {
            "vec_id": np.arange(n_vec, dtype=np.int64),
            "embedding": emb,
            "label": label.astype(np.int32),
        },
    )

    with open(os.path.join(out_dir, "GENERATED.json"), "w") as fh:
        json.dump({"sf": sf, "seed": seed, "base": BASE, "tool": "tools/gen_sf.py"}, fh)


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfgen/sf{sys.argv[1] if len(sys.argv) > 1 else '1'}"
    print(f"generating sf={sf} into {out}")
    gen(sf, out)
    print("done")
