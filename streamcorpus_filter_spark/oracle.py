"""Row-at-a-time reference-semantics oracle (SURVEY.md §0, §5.2 L2).

The reference mount is empty, so "the reference's keep/drop decision"
(BASELINE.json:14) is operationalized as this pure-Python, scalar,
per-document implementation of every pipeline stage. The Spark pipeline
must match it at F1>=0.99 on keep/drop and byte-identically on
scrubbed/extracted text. Oracle and pipeline share the SPEC (rules.py
constants) and the two canonical byte-level kernels (extract_text,
scrub_pii/mask_spans) but NOT the scanning/scoring codepaths: entity and
toxicity matching here is a bytes.find loop (vs the numpy Aho-Corasick
DFA), langid/ppl scoring is scalar dict/loop math (vs bincount/matmul).
"""

from __future__ import annotations

from dataclasses import dataclass

from .kernels import rules
from .kernels.extract import extract_text
from .kernels.langid import LangIdModel
from .kernels.lm import CharLM
from .kernels.scrub import boundary_ok, mask_spans, scrub_pii
from .names import FilterNames


def find_all(hay: bytes, needle: bytes) -> list[int]:
    out = []
    start = 0
    while True:
        i = hay.find(needle, start)
        if i < 0:
            return out
        out.append(i)
        start = i + 1


def entity_matches(
    text: str, fn: FilterNames
) -> list[tuple[str, str, int, int]]:
    """All (target_id, name, begin, end) hits; byte offsets into the
    lowercased UTF-8 text — brute-force scan, overlaps included."""
    data = text.lower().encode("utf-8")
    hits: list[tuple[str, str, int, int]] = []
    for name in fn.names:
        nb = name.encode("utf-8")
        for b in find_all(data, nb):
            for tid in fn.name_to_target_ids[name]:
                hits.append((tid, name, b, b + len(nb)))
    return hits


def toxic_spans(text: str, terms: list[str]) -> list[tuple[int, int]]:
    """Word-boundary-valid spans of lexicon terms; ASCII-lowered bytes so
    offsets are stable w.r.t. the original text."""
    data = text.encode("utf-8").lower()
    spans = []
    for term in terms:
        tb = term.lower().encode("utf-8")
        for b in find_all(data, tb):
            if boundary_ok(data, b, b + len(tb)):
                spans.append((b, b + len(tb)))
    return spans


@dataclass
class OracleResult:
    keep: bool
    drop_reason: str | None
    extracted: str
    lang_pred: str | None = None
    lang_conf: float | None = None
    ppl: float | None = None
    top2gram_frac: float | None = None
    patterns_matched: int | None = None
    total_hits: int | None = None
    matches: list[tuple[str, str, int, int]] | None = None
    scrubbed_text: str | None = None
    bytes_scrubbed: int | None = None
    tox_hits: int | None = None


def oracle_row(
    html: bytes | None,
    langid: LangIdModel,
    charlm: CharLM,
    fn: FilterNames,
    toxic_terms: list[str],
    text: str | None = None,
) -> OracleResult:
    """Full pipeline semantics for one document. ``text`` overrides
    extraction when the input table carries pre-extracted text."""
    extracted = extract_text(html) if text is None else text

    sig = rules.structural_signals(extracted)
    reason = rules.structural_drop_reason(sig)
    if reason is not None:
        return OracleResult(False, reason, extracted)

    # UDF-stage signals, short-circuited in DROP_ORDER
    top2 = sig["top2gram_frac"]  # structural computes it; cascade order here
    lang_pred, lang_conf = langid.score_one(extracted)
    ppl = charlm.ppl_scalar(extracted)

    if lang_conf < rules.MIN_LANG_CONF:
        return OracleResult(
            False, "lang_uncertain", extracted,
            lang_pred=lang_pred, lang_conf=lang_conf, ppl=ppl, top2gram_frac=top2,
        )
    if ppl > rules.MAX_PPL:
        return OracleResult(
            False, "high_ppl", extracted,
            lang_pred=lang_pred, lang_conf=lang_conf, ppl=ppl, top2gram_frac=top2,
        )

    hits = entity_matches(extracted, fn)
    # pattern-level counts: a shared surface form hitting two targets is
    # ONE automaton hit (targets expand only in the matches annotation)
    pattern_hits = {(h[1], h[2]) for h in hits}
    distinct = len({name for name, _b in pattern_hits})

    scrubbed, pii_bytes, _pii_hits = scrub_pii(extracted)
    spans = toxic_spans(scrubbed, toxic_terms)
    tox_hits = len(spans)
    if tox_hits >= rules.TOX_DROP_HITS:
        return OracleResult(
            False, "toxic", extracted,
            lang_pred=lang_pred, lang_conf=lang_conf, ppl=ppl, top2gram_frac=top2,
            patterns_matched=distinct, total_hits=len(pattern_hits), matches=hits,
            tox_hits=tox_hits,
        )
    masked, tox_bytes = mask_spans(scrubbed, spans)
    return OracleResult(
        True, None, extracted,
        lang_pred=lang_pred, lang_conf=lang_conf, ppl=ppl, top2gram_frac=top2,
        patterns_matched=distinct, total_hits=len(pattern_hits), matches=hits,
        scrubbed_text=masked, bytes_scrubbed=pii_bytes + tox_bytes,
        tox_hits=tox_hits,
    )
