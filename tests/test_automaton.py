"""L1 kernel tests: numpy Aho-Corasick vs brute-force bytes.find.

Property-based (seeded) per SURVEY.md §5.2: random pattern sets over small
alphabets (maximizing overlap/nesting), random texts; every (pattern,
offset) hit must agree with a scalar brute-force scan, overlapping
occurrences included (multifast ac_automata_search semantics [RECALL]).
"""

from __future__ import annotations

import random

import numpy as np

from streamcorpus_filter_spark.kernels.automaton import ACAutomaton


def brute_force(patterns: list[str], text: str) -> set[tuple[int, int]]:
    """(pid, begin) byte offsets of every occurrence, overlapping included."""
    t = text.lower().encode("utf-8")
    hits = set()
    for pid, p in enumerate(patterns):
        pb = p.lower().encode("utf-8")
        start = 0
        while True:
            i = t.find(pb, start)
            if i < 0:
                break
            hits.add((pid, i))
            start = i + 1
    return hits


def ac_hits(ac: ACAutomaton, texts: list[str]) -> list[set[tuple[int, int]]]:
    rows, begins, pids = ac.search_batch([ACAutomaton.encode(t) for t in texts])
    out: list[set[tuple[int, int]]] = [set() for _ in texts]
    for r, b, p in zip(rows.tolist(), begins.tolist(), pids.tolist()):
        out[r].add((p, b))
    return out


def test_simple_overlap_and_nesting():
    pats = ["ab", "abab", "b", "bab"]
    ac = ACAutomaton(pats)
    texts = ["ababab", "xx", "", "b", "ABAB"]
    got = ac_hits(ac, texts)
    for t, g in zip(texts, got):
        assert g == brute_force(pats, t), t


def test_multiword_and_nested_names():
    pats = ["sort merge", "merge", "spark", "park"]
    ac = ACAutomaton(pats)
    t = "the sort merge join sparkles in the park; spark spark"
    (g,) = ac_hits(ac, [t])
    assert g == brute_force(pats, t)


def test_property_random_small_alphabet():
    rng = random.Random(42)
    for trial in range(30):
        alpha = "ab" if trial % 2 == 0 else "abc"
        pats: set[str] = set()
        while len(pats) < rng.randint(1, 8):
            pats.add(
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
            )
        patterns = sorted(pats)
        ac = ACAutomaton(patterns)
        texts = [
            "".join(rng.choice(alpha + " ") for _ in range(rng.randint(0, 200)))
            for _ in range(20)
        ]
        got = ac_hits(ac, texts)
        for t, g in zip(texts, got):
            assert g == brute_force(patterns, t)


def test_property_unicode():
    rng = random.Random(7)
    alpha = "aé日 b"
    patterns = ["é日", "日", "aé", "b b"]
    ac = ACAutomaton(patterns)
    texts = ["".join(rng.choice(alpha) for _ in range(100)) for _ in range(10)]
    got = ac_hits(ac, texts)
    for t, g in zip(texts, got):
        assert g == brute_force(patterns, t)


def test_count_batch_matches_search():
    pats = ["ab", "b", "abc"]
    ac = ACAutomaton(pats)
    texts = ["ababc", "", "bbb", "zzz"]
    enc = [ACAutomaton.encode(t) for t in texts]
    distinct, total = ac.count_batch(enc)
    hits = ac_hits(ac, texts)
    for i, h in enumerate(hits):
        assert total[i] == len(h)
        assert distinct[i] == len({pid for pid, _ in h})


def test_length_grouping_chunks():
    # force multiple scan groups via tiny max_cells
    pats = ["aa", "ba"]
    ac = ACAutomaton(pats)
    rng = random.Random(3)
    texts = ["".join(rng.choice("ab") for _ in range(rng.randint(0, 50))) for _ in range(50)]
    enc = [ACAutomaton.encode(t) for t in texts]
    rows, begins, pids = ac.search_batch(enc, max_cells=64)
    got: list[set] = [set() for _ in texts]
    for r, b, p in zip(rows.tolist(), begins.tolist(), pids.tolist()):
        got[r].add((p, b))
    for t, g in zip(texts, got):
        assert g == brute_force(pats, t)
    assert rows.dtype == np.int64 or rows.dtype == np.int32


def test_filternames_json_roundtrip_and_df_loader(spark):
    from streamcorpus_filter_spark.names import DEFAULT_FILTER_NAMES, FilterNames

    fn = DEFAULT_FILTER_NAMES
    back = FilterNames.from_json(fn.to_json())
    assert back.target_id_to_names == fn.target_id_to_names
    assert back.names == fn.names

    rows = [
        (tid, n)
        for tid, names in fn.target_id_to_names.items()
        for n in names
    ]
    df = spark.createDataFrame(rows, "target_id string, name string")
    loaded = FilterNames.from_dataframe(df)
    assert loaded.names == fn.names
    assert loaded.name_to_target_ids == fn.name_to_target_ids
