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

    def count_batch(self, texts: list[str]) -> list[list[int]]:
        """Per-doc per-term non-overlapping counts for a batch of ASCII/UTF-8
        texts (bytes-level automaton: terms and texts are matched on their
        UTF-8 bytes, which equals char-level for ASCII dictionaries)."""
        import numpy as np

        if not texts:
            return []
        raw = [t.encode("utf-8") if t else b"" for t in texts]
        lens = np.array([len(r) for r in raw], dtype=np.int64)
        lmax = int(lens.max()) if len(lens) else 0
        if lmax == 0:
            return [[0] * len(self.terms) for _ in texts]
        batch = np.zeros((len(raw), lmax), dtype=np.uint8)
        for i, r in enumerate(raw):
            batch[i, : len(r)] = np.frombuffer(r, dtype=np.uint8)
        states = np.zeros(len(raw), dtype=np.int32)
        hits: list[tuple[int, int, int]] = []  # (doc_idx, state, end_pos)
        nxt, has_out = self.nxt, self.has_out
        for pos in range(lmax):
            states = nxt[states, batch[:, pos]]
            emit = np.flatnonzero(has_out[states] & (pos < lens))
            for di in emit:
                hits.append((int(di), int(states[di]), pos + 1))
        counts = [[0] * len(self.terms) for _ in texts]
        next_free = [[0] * len(self.terms) for _ in texts]
        for di, st, end in hits:  # hits are in (pos, doc) order -> per-doc L2R
            for ti in self.out[st]:
                start = end - self.term_len[ti]
                if start >= next_free[di][ti]:
                    counts[di][ti] += 1
                    next_free[di][ti] = end
        return counts


def dictionary_scan(
    df: DataFrame, text_col: str, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """One-pass dictionary occurrence counts via mapInPandas: each Arrow
    batch streams through the broadcast-by-closure automaton once per doc;
    output is long-form (id, term_idx, occ) with occ > 0 rows only."""
    ac = AhoCorasick(terms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            tis: list[int] = []
            occs: list[int] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for ti, c in enumerate(ac.count_nonoverlapping(text or "")):
                    if c:
                        ids.append(int(did))
                        tis.append(ti)
                        occs.append(c)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "term_idx": pd.Series(tis, dtype="int32"),
                    "occ": pd.Series(occs, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema="doc_id bigint, term_idx int, occ bigint"
    )


# Measured crossover (round 11, tools/bench_textscan.py -> tools/
# textscan_r11.json, SCALING.md): the per-term JVM replace-diff rescans the
# corpus once PER TERM but each pass is codegen'd; the one-pass automaton
# pays the Python boundary once.  On the sf1 corpus the replace-diff wins
# up to ~35 terms on both head- and tail-skewed dictionaries and loses
# ~linearly beyond (5000-term head dict: 277s sampled per-term vs 7.6s
# automaton).  At 100 TB picking the wrong branch costs ~10x, so the
# dispatcher -- not the caller -- applies the policy table.
TAG_DICTIONARY_CROSSOVER = 35


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
