"""Query inventory modules — each registers into queries.QUERIES/ORACLE_SQL.

One module per SURVEY.md §2 family:
  relational  — scans, joins, aggs, windows, sorts, set ops, scalar funcs
  quality     — the ql_* web-corpus pipeline stages
  dedup       — exact / MinHash-LSH / SimHash / Jaccard / cosine near-dup
  similarity  — ANN top-k over embeddings
  textstats   — token counts, fingerprints, quality scores
"""
