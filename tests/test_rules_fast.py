"""L1 parity: structural_reason_fast (the fused-kernel fast path) must
agree with structural_signals + structural_drop_reason (the oracle's
scalar path) — same reason string, doc by doc — and scrub_pii's trigger
gates must stay byte-identical."""

from __future__ import annotations

import pytest

from streamcorpus_filter_spark.kernels import rules
from streamcorpus_filter_spark.kernels.scrub import scrub_pii


def _scalar_reason(text: str) -> str | None:
    return rules.structural_drop_reason(rules.structural_signals(text))


def test_fast_reason_matches_scalar_on_corpus():
    from streamcorpus_filter_spark.synth import make_pages

    texts = make_pages(1500, seed=42)["text"] + make_pages(300, seed=99)["text"]
    for i, t in enumerate(texts):
        assert rules.structural_reason_fast(t) == _scalar_reason(t), f"doc {i}"


def test_fast_reason_matches_scalar_on_unicode_numerics():
    """\\w-but-not-alpha chars (superscripts, No/Nl numerics) must not count
    as letters in the fast path — the exact divergence a [^\\W\\d_] regex
    class would introduce vs the scalar any(isalpha) spec."""
    weird = "x² Ⅳ ½ ² ³ 壹"  # isalpha(): False for ² ½ Ⅳ (No/Nl), True for 壹 (Lo)
    for filler in ["", "the and was for it. " * 20]:
        t = (weird + " ") * 30 + filler
        assert rules.structural_reason_fast(t) == _scalar_reason(t)
    # direct count parity on tokens mixing letters/digits/numerics
    toks = ["²", "x²", "123", "Ⅳ", "a1", "_", "½½", "壹"]
    spec = sum(1 for tok in toks if any(c.isalpha() for c in tok))
    text = " ".join(toks)
    sigs = rules.structural_signals(text)
    assert abs(sigs["alpha_frac"] - spec / len(toks)) < 1e-12


@pytest.mark.parametrize(
    "text",
    [
        "",
        "\n\n",
        "word",
        "- bullet\n- bullet\n- bullet",
        "a b c " * 100,          # rep_top2gram candidate
        "123 456 789 " * 60,     # all-numeric tokens -> gopher_alpha
        "the and of to in is. " * 30,
        "... ... ... # # # " * 40,
        "lorem ipsum " + "the quick brown fox jumps. " * 30,
        "{ code } " + "the and was for with that. " * 30,
        "line without punct\n" * 60 + "the and of to in is was.",
        "　ideographic space not in token class. " * 30,
    ],
)
def test_fast_reason_matches_scalar_edges(text):
    assert rules.structural_reason_fast(text) == _scalar_reason(text)


@pytest.mark.parametrize(
    "text",
    [
        "no pii here at all",
        "mail me at a.b+c@ex-ample.co.uk now",
        "ssn 123-45-6789 phone (555) 123-4567 ip 10.0.0.1",
        "digits 2024 but no pii",
        "at sign @ alone",
        "v1.2.3.4 is a version not an ip?",  # trailing char changes ipv4 rule
        "",
    ],
)
def test_scrub_gate_is_transparent(text):
    """With gates active the output must equal running the full rule chain
    unconditionally (gates only skip rules that cannot match)."""
    import re

    got = scrub_pii(text)
    ref_text, ref_bytes, ref_hits = text, 0, 0
    for _name, pat, repl in __import__(
        "streamcorpus_filter_spark.kernels.scrub", fromlist=["SCRUB_RULES"]
    ).SCRUB_RULES:
        spans: list[str] = []

        def _sub(m: re.Match[str]) -> str:
            spans.append(m.group(0))
            return repl

        ref_text, n = pat.subn(_sub, ref_text)
        ref_hits += n
        ref_bytes += sum(len(s.encode("utf-8")) for s in spans)
    assert got == (ref_text, ref_bytes, ref_hits)
