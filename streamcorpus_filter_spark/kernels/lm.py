"""KenLM-style character-n-gram perplexity (SURVEY.md §2.2 ql_perplexity).

A hashed-count trigram LM with additive smoothing — the CCNet recipe's
"perplexity of a small LM as a quality score", built from scratch because
the sandbox has no kenlm (SURVEY.md §0). Counts live in two flat numpy
arrays (context and trigram buckets), broadcast once; scoring is vectorized
per document (gather + log), batch-looped.

ppl(doc) = exp(-mean_i log p(c_i | c_{i-2} c_{i-1})) over the lowercased
UTF-8 bytes; docs shorter than 3 bytes score 0.0 (never dropped for ppl).
"""

from __future__ import annotations

import numpy as np

B2 = 4096
B3 = 65536
ALPHA = 0.1


def _ctx_hashes(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # B2/B3 are powers of two and values non-negative: & == % without the
    # 64-bit division (same trick as langid.ngram_hashes; the scalar
    # oracle path keeps % — identical values either way)
    ctx = a[:-2] * 31 + a[1:-1]
    h3 = (ctx * 31 + a[2:]) & (B3 - 1)
    return ctx & (B2 - 1), h3


class CharLM:
    __slots__ = ("c2", "c3")

    def __init__(self, c2: np.ndarray, c3: np.ndarray):
        self.c2 = c2
        self.c3 = c3

    @classmethod
    def train(cls, texts: list[str]) -> "CharLM":
        c2 = np.zeros(B2, dtype=np.float64)
        c3 = np.zeros(B3, dtype=np.float64)
        for t in texts:
            a = np.frombuffer(t.lower().encode("utf-8"), dtype=np.uint8).astype(
                np.int64
            )
            if a.size < 3:
                continue
            h2, h3 = _ctx_hashes(a)
            np.add.at(c2, h2, 1.0)
            np.add.at(c3, h3, 1.0)
        return cls(c2, c3)

    def ppl(self, data: bytes) -> float:
        a = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        if a.size < 3:
            return 0.0
        h2, h3 = _ctx_hashes(a)
        ll = np.log(self.c3[h3] + ALPHA) - np.log(self.c2[h2] + ALPHA * 256)
        return float(np.exp(-ll.mean()))

    def ppl_batch(self, texts: list[bytes]) -> np.ndarray:
        return np.array([self.ppl(t) for t in texts], dtype=np.float64)

    def ppl_scalar(self, text: str) -> float:
        """Pure-Python scalar scoring for the oracle (disjoint codepath)."""
        import math

        data = text.lower().encode("utf-8")
        if len(data) < 3:
            return 0.0
        s = 0.0
        n = 0
        for i in range(2, len(data)):
            ctx = data[i - 2] * 31 + data[i - 1]
            h3 = (ctx * 31 + data[i]) % B3
            h2 = ctx % B2
            s += math.log(float(self.c3[h3]) + ALPHA) - math.log(
                float(self.c2[h2]) + ALPHA * 256
            )
            n += 1
        return math.exp(-s / n)
