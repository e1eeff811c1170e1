"""Model builders — trained once per process from the deterministic
synthetic corpus, cached, and (in the pipeline) broadcast from the driver.

On a real cluster these would be loaded from artifact files shipped with
--py-files; here training is seconds and fully deterministic, which keeps
the repo self-contained (no binary blobs in git).
"""

from __future__ import annotations

from functools import lru_cache

from .kernels.automaton import ACAutomaton
from .kernels.langid import LangIdModel
from .kernels.lm import CharLM
from .names import FilterNames
from .synth import PAGES_FILTER_NAMES, TOXIC_LEXICON, training_corpus


@lru_cache(maxsize=1)
def default_langid() -> LangIdModel:
    return LangIdModel.train(training_corpus())


@lru_cache(maxsize=1)
def default_charlm() -> CharLM:
    corpus = training_corpus()
    texts = [t for docs in corpus.values() for t in docs]
    return CharLM.train(texts)


@lru_cache(maxsize=1)
def pages_automaton() -> ACAutomaton:
    return PAGES_FILTER_NAMES.compile()


@lru_cache(maxsize=1)
def toxic_automaton() -> ACAutomaton:
    return ACAutomaton([t for t, _sev in TOXIC_LEXICON])


@lru_cache(maxsize=1)
def pages_filternames() -> FilterNames:
    return PAGES_FILTER_NAMES
