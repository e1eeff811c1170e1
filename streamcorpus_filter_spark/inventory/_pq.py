"""Product-quantization constants + the quantize-to-integer-milli-units
SQL — a LEAF module (imports nothing from this package) so that any
inventory module can use them at ORACLE-BUILD (module import) time
without creating an inventory cross-import. dedup.py's
sim_ann_persisted oracle f-strings these at decorator time; importing
them from selection.py instead made `import inventory.selection` from a
test deadlock partially-initialized through the queries registry (the
same cycle class _minhash.py and _text.py exist to prevent).

The geometry: 64-dim embeddings = PQ_M x PQ_SUB subspaces, PQ_K
centroids per subspace. PQ_CLAMP bounds quantized milli-units so a
64-term squared-diff sum can never leave BIGINT range on either engine
(DuckDB would silently widen to HUGEINT while Spark wraps/errors — the
clamp is what keeps the two engines bit-identical)."""

from __future__ import annotations

PQ_M = 8  # subspaces
PQ_SUB = 8  # dims per subspace (embeddings are 64-dim)
PQ_K = 16  # centroids per subspace -> 4-bit codes
PQ_CLAMP = 1_000_000

_QUANT_SPARK = (
    "transform(embedding, x -> greatest(least(CAST(floor(CAST(x AS DOUBLE)"
    f" * 1000) AS BIGINT), {PQ_CLAMP}), -{PQ_CLAMP}))"
)
_QUANT_DUCK = (
    "list_transform(embedding, x -> greatest(least(CAST(floor(CAST(x AS"
    f" DOUBLE) * 1000) AS BIGINT), {PQ_CLAMP}), -{PQ_CLAMP}))"
)
