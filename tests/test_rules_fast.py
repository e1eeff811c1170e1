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


def test_fast_alpha_token_scan_matches_isalpha_on_corpus():
    """The one-scan letter-token regex must count exactly the tokens the
    scalar any(isalpha) counts, token class by token class."""
    from streamcorpus_filter_spark.synth import make_pages

    for t in make_pages(500, seed=7)["text"]:
        fast = len(rules._ALPHA_TOKEN_RE.findall(t))
        scalar = sum(
            1 for tok in rules.tokens(t) if any(c.isalpha() for c in tok)
        )
        assert fast == scalar, t[:80]


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
