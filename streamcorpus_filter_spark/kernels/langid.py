"""fastText-style language identification (SURVEY.md §2.2 ql_langid).

Same modeling idea as fastText's langid (Joulin et al. 2016): a bag of
hashed character n-grams feeding a linear classifier — here a multinomial
Naive Bayes over hashed 1/2/3-gram byte buckets, trained offline on the
deterministic synthetic corpus (no external data; the sandbox has no
fasttext package — SURVEY.md §0). The trained model is two numpy arrays
(log-probability matrix + prior), broadcast once, scored batch-at-a-time
with a single bincount + matmul per Arrow batch.

Confidence = softmax over length-normalized log-likelihoods with a fixed
sharpening scale, so `lang_conf` is comparable across document lengths.
"""

from __future__ import annotations

import numpy as np

N_BUCKETS = 4096
CONF_SCALE = 10.0  # softmax sharpening on per-gram avg log-likelihood


def ngram_hashes(data: bytes) -> np.ndarray:
    """Bucket ids of all 1/2/3-grams of ``data`` (lowercased UTF-8)."""
    a = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    if a.size == 0:
        return np.zeros(0, dtype=np.int64)
    parts = [a]
    if a.size >= 2:
        parts.append(a[:-1] * 31 + a[1:])
    if a.size >= 3:
        parts.append((a[:-2] * 31 + a[1:-1]) * 31 + a[2:])
    # N_BUCKETS is a power of two and values are non-negative, so & is
    # exactly % but avoids 64-bit division (~6x on the hash pass)
    return np.concatenate(parts) & (N_BUCKETS - 1)


class LangIdModel:
    __slots__ = ("langs", "logp", "prior")

    def __init__(self, langs: list[str], logp: np.ndarray, prior: np.ndarray):
        self.langs = langs
        self.logp = logp  # (L, N_BUCKETS)
        self.prior = prior  # (L,)

    @classmethod
    def train(cls, corpus: dict[str, list[str]]) -> "LangIdModel":
        """Add-one-smoothed multinomial NB from {lang: [training texts]}."""
        langs = sorted(corpus)
        counts = np.zeros((len(langs), N_BUCKETS), dtype=np.float64)
        n_docs = np.zeros(len(langs), dtype=np.float64)
        for li, lang in enumerate(langs):
            for text in corpus[lang]:
                h = ngram_hashes(text.lower().encode("utf-8"))
                if h.size:
                    counts[li] += np.bincount(h, minlength=N_BUCKETS)
            n_docs[li] = max(len(corpus[lang]), 1)
        logp = np.log(counts + 1.0) - np.log(
            counts.sum(axis=1, keepdims=True) + N_BUCKETS
        )
        prior = np.log(n_docs / n_docs.sum())
        return cls(langs, logp, prior)

    def score_batch(
        self, texts: list[bytes]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (pred_idx int64[n], conf float64[n]).

        Whole-batch vectorization (measured 8x over a per-doc loop): all
        docs are concatenated into ONE byte buffer, the 1/2/3-gram hashes
        are computed in single vector passes with cross-doc-boundary grams
        masked out, and one bincount over doc-offset bucket ids yields the
        (n, N_BUCKETS) count matrix. The count matrix is cast to float64
        before the matmul so BLAS runs it (the implicit int64 path is
        ~50x slower and not BLAS-backed)."""
        n = len(texts)
        if n == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        data = np.frombuffer(b"".join(texts), dtype=np.uint8).astype(np.int64)
        nbytes = data.size
        if nbytes:
            doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            off = doc_of * N_BUCKETS
            mask = N_BUCKETS - 1  # power of two: & == % for non-negatives
            parts = [(data & mask) + off]
            if nbytes >= 2:
                h2 = (data[:-1] * 31 + data[1:]) & mask
                same = doc_of[:-1] == doc_of[1:]
                parts.append((h2 + off[:-1])[same])
            if nbytes >= 3:
                h3 = (((data[:-2] * 31 + data[1:-1]) * 31 + data[2:]) & mask)
                same = doc_of[:-2] == doc_of[2:]
                parts.append((h3 + off[:-2])[same])
            flat = (
                np.bincount(np.concatenate(parts), minlength=n * N_BUCKETS)
                .reshape(n, N_BUCKETS)
                .astype(np.float64)
            )
        else:
            flat = np.zeros((n, N_BUCKETS))
        totals = np.maximum(flat.sum(axis=1, keepdims=True), 1.0)
        avg_ll = (flat @ self.logp.T) / totals  # (n, L) per-gram avg
        scaled = avg_ll * CONF_SCALE
        scaled -= scaled.max(axis=1, keepdims=True)
        probs = np.exp(scaled)
        probs /= probs.sum(axis=1, keepdims=True)
        pred = np.argmax(probs, axis=1).astype(np.int64)
        conf = probs[np.arange(n), pred]
        # empty docs: undecidable -> first lang with conf 1/L
        empty = totals[:, 0] <= 1.0
        empty &= np.array([len(t) == 0 for t in texts])
        pred[empty] = 0
        conf[empty] = 1.0 / len(self.langs)
        return pred, conf

    def score_one(self, text: str) -> tuple[str, float]:
        """Scalar scoring for the row-at-a-time oracle — same math as
        score_batch but computed with plain Python dict counting (disjoint
        codepath per SURVEY.md §0)."""
        data = text.lower().encode("utf-8")
        if not data:
            return self.langs[0], 1.0 / len(self.langs)
        counts: dict[int, int] = {}
        n_grams = 0
        for i in range(len(data)):
            h = data[i] % N_BUCKETS
            counts[h] = counts.get(h, 0) + 1
            n_grams += 1
            if i + 1 < len(data):
                h2 = (data[i] * 31 + data[i + 1]) % N_BUCKETS
                counts[h2] = counts.get(h2, 0) + 1
                n_grams += 1
            if i + 2 < len(data):
                h3 = ((data[i] * 31 + data[i + 1]) * 31 + data[i + 2]) % N_BUCKETS
                counts[h3] = counts.get(h3, 0) + 1
                n_grams += 1
        import math

        avg = []
        for li in range(len(self.langs)):
            s = 0.0
            row = self.logp[li]
            for h, c in counts.items():
                s += c * float(row[h])
            avg.append(s / max(n_grams, 1))
        mx = max(a * CONF_SCALE for a in avg)
        exps = [math.exp(a * CONF_SCALE - mx) for a in avg]
        z = sum(exps)
        best = max(range(len(avg)), key=lambda i: exps[i])
        return self.langs[best], exps[best] / z
