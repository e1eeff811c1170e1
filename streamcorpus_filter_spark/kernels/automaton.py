"""Aho-Corasick multi-pattern automaton, numpy-vectorized for Arrow batches.

Reference parity: the reference's core is a vendored multifast Aho-Corasick
C library (``ahocorasick.c``: ac_automata_add / ac_automata_finalize /
ac_automata_search) driven by a FilterNames dictionary — see SURVEY.md §2.1
[RECALL; reference mount empty at build time]. Same semantics here:
case-insensitive single-pass multi-pattern substring search reporting every
(pattern, offset) hit, including overlapping and nested hits.

Spark-first redesign (NOT a port): instead of a per-item scalar scan, the
automaton is compiled ONCE on the driver into three flat numpy arrays
(dense byte-level DFA goto table + CSR output lists), broadcast to
executors, and the scan is vectorized ACROSS the documents of an Arrow
batch: documents are stacked into a (n_docs, max_len) uint8 matrix and the
DFA advances all rows simultaneously one byte-column at a time — the Python
loop is over text length, every op inside it is a numpy gather over the
whole batch. Cost is O(total_bytes) with numpy constants, independent of
pattern count (the Aho-Corasick property the reference's README benchmarks
celebrate).

Offsets are BYTE offsets into the lowercased UTF-8 encoding of the text
(the oracle uses bytes.find on the same encoding, so parity is exact).
"""

from __future__ import annotations

from collections import deque

import numpy as np

_PAD = 0  # padding byte; patterns must not contain NUL so pad rows sit at root


class ACAutomaton:
    """Dense-DFA Aho-Corasick over bytes.

    Parameters
    ----------
    patterns : list[str]
        Unique, non-empty patterns. Matching is case-insensitive: patterns
        and scanned text are both ``str.lower()``-ed then UTF-8 encoded.
    """

    __slots__ = (
        "patterns",
        "pat_bytes",
        "pat_lens",
        "goto",
        "out_start",
        "out_cnt",
        "out_pids",
        "n_states",
    )

    def __init__(self, patterns: list[str]):
        if len(set(patterns)) != len(patterns):
            raise ValueError("patterns must be unique")
        self.patterns = list(patterns)
        self.pat_bytes = [p.lower().encode("utf-8") for p in patterns]
        if any(len(p) == 0 for p in self.pat_bytes):
            raise ValueError("empty pattern")
        if any(_PAD in p for p in self.pat_bytes):
            raise ValueError("patterns must not contain NUL bytes")
        self.pat_lens = np.array([len(p) for p in self.pat_bytes], dtype=np.int32)
        self._build()

    def _build(self) -> None:
        children: list[dict[int, int]] = [{}]
        out: list[list[int]] = [[]]
        for pid, p in enumerate(self.pat_bytes):
            s = 0
            for b in p:
                nxt = children[s].get(b)
                if nxt is None:
                    nxt = len(children)
                    children[s][b] = nxt
                    children.append({})
                    out.append([])
                s = nxt
            out[s].append(pid)

        n = len(children)
        goto = np.zeros((n, 256), dtype=np.int32)
        fail = np.zeros(n, dtype=np.int32)
        q: deque[int] = deque()
        for b, s in children[0].items():
            goto[0, b] = s
            q.append(s)
        # BFS; by the time state r is processed, goto rows of all shallower
        # states are full DFA rows, so goto[fail[r]] is a valid fallback row.
        while q:
            r = q.popleft()
            row = goto[fail[r]].copy()
            for b, s in children[r].items():
                fail[s] = row[b]
                if out[fail[s]]:
                    out[s] = out[s] + out[fail[s]]  # flatten suffix outputs
                row[b] = s
                q.append(s)
            goto[r] = row

        cnt = np.array([len(o) for o in out], dtype=np.int32)
        start = np.zeros(n, dtype=np.int64)
        np.cumsum(cnt[:-1], out=start[1:])
        self.goto = goto
        self.out_cnt = cnt
        self.out_start = start
        self.out_pids = np.array(
            [pid for o in out for pid in o], dtype=np.int32
        ) if cnt.sum() else np.zeros(0, dtype=np.int32)
        self.n_states = n

    # ------------------------------------------------------------------ scan

    @staticmethod
    def encode(text: str) -> bytes:
        """Canonical normalization shared with the oracle."""
        return text.lower().encode("utf-8")

    def search_batch(
        self, texts: list[bytes], max_cells: int = 8_000_000
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Scan a batch. Returns (doc_idx, begin, pid) arrays, one entry per
        hit; ``end = begin + pat_lens[pid]``. Hits are reported for every
        occurrence, overlapping included (multifast ac_automata_search
        semantics). Docs are grouped by length to bound padding waste.
        """
        n_docs = len(texts)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
        order = np.argsort(lens, kind="stable")

        rows_acc: list[np.ndarray] = []
        ends_acc: list[np.ndarray] = []
        states_acc: list[np.ndarray] = []

        goto = self.goto
        has_out = self.out_cnt > 0

        i = 0
        while i < n_docs:
            # grow the group while the padded matrix stays under max_cells
            j = i + 1
            while j < n_docs and (j + 1 - i) * max(int(lens[order[j]]), 1) <= max_cells:
                j += 1
            grp = order[i:j]
            L = int(lens[grp].max(initial=0))
            i = j
            if L == 0:
                continue
            mat = np.zeros((len(grp), L), dtype=np.uint8)
            for k, g in enumerate(grp):
                t = texts[g]
                if t:
                    mat[k, : len(t)] = np.frombuffer(t, dtype=np.uint8)
            state = np.zeros(len(grp), dtype=np.int32)
            for col in range(L):
                state = goto[state, mat[:, col]]
                m = has_out[state]
                if m.any():
                    r = np.nonzero(m)[0]
                    rows_acc.append(grp[r])
                    ends_acc.append(np.full(r.size, col + 1, dtype=np.int64))
                    states_acc.append(state[r])

        if not rows_acc:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), np.zeros(0, dtype=np.int32)

        rows = np.concatenate(rows_acc)
        ends = np.concatenate(ends_acc)
        sts = np.concatenate(states_acc)
        # expand CSR output lists: one hit row per (state-output pattern)
        cnt = self.out_cnt[sts].astype(np.int64)
        total = int(cnt.sum())
        rep_rows = np.repeat(rows, cnt)
        rep_ends = np.repeat(ends, cnt)
        base = np.repeat(self.out_start[sts], cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        pids = self.out_pids[base + within]
        begins = rep_ends - self.pat_lens[pids]
        return rep_rows, begins, pids

    def count_batch(self, texts: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc (distinct_patterns_present, total_hits) — the filter
        predicate fast path (no offset materialization needed)."""
        rows, _begins, pids = self.search_batch(texts)
        n = len(texts)
        total = np.bincount(rows, minlength=n).astype(np.int64)
        if rows.size:
            P = len(self.patterns)
            uniq = np.unique(rows.astype(np.int64) * P + pids)
            distinct = np.bincount(uniq // P, minlength=n).astype(np.int64)
        else:
            distinct = np.zeros(n, dtype=np.int64)
        return distinct, total
