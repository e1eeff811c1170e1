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
    return np.concatenate(parts) % N_BUCKETS


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
        """Returns (pred_idx int64[n], conf float64[n])."""
        n = len(texts)
        if n == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        hashes = []
        doc_of = []
        for i, t in enumerate(texts):
            h = ngram_hashes(t)
            if h.size:
                hashes.append(h + i * N_BUCKETS)
        if hashes:
            flat = np.bincount(
                np.concatenate(hashes), minlength=n * N_BUCKETS
            ).reshape(n, N_BUCKETS)
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
