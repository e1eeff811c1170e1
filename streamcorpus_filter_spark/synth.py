"""Deterministic synthetic web-page corpus (FIXTURES.md §B; seed-stable).

Generates the ``pages`` table in exactly the input_hint shape
(url, warc_ts, html, text, lang — BASELINE.json:15), with planted features
per stage: Gopher violations, C4 violations, repetition, gibberish (high
perplexity), PII, toxic terms, entity names (nested / overlapping /
shared-surface-form), Zipf-skewed hosts (hot-host salting tests), and
duplicate urls (dedup tests). ``text`` is BY CONSTRUCTION the extraction
of ``html`` (we build html first, then run the canonical kernel), so the
byte-identical invariant is testable end-to-end.

No external data; everything derives from embedded vocabularies and
``random.Random(seed)``.
"""

from __future__ import annotations

import html as _htmllib
import random
from datetime import datetime, timedelta

from .kernels.extract import extract_text
from .names import FilterNames

VOCAB: dict[str, list[str]] = {
    "en": (
        "the and of to in is was for with that from this have are not but "
        "they his her you all can had there one what were when out many time "
        "people water long little work world over such make even most after "
        "house old great small found between never under last thought"
    ).split(),
    "fr": (
        "le la les et de un une est dans pour avec que ne pas du au des il "
        "elle nous vous sont mais plus tout comme bien sans deux fait peut "
        "temps monde jour homme femme chose vie eau terre grand petit "
        "toujours jamais entre depuis pendant quelque chaque"
    ).split(),
    "es": (
        "el los las y en que es por con para una del se no lo como más pero "
        "sus le ya o este sí porque esta entre cuando muy sin sobre también "
        "me hasta hay donde quien desde todo nos durante todos uno les "
        "contra otros ese eso ante ellos"
    ).split(),
    "de": (
        "der die das und ist nicht mit von zu ein eine für auf dem sich des "
        "auch an werden aus er hat dass sie nach wird bei einer um am sind "
        "noch wie einem über einen so zum war haben nur oder aber vor zur "
        "bis mehr durch man sein wurde"
    ).split(),
    "zh": (
        "的 一 是 不 了 人 我 在 有 他 这 中 大 来 上 国 个 到 说 们 为 子 和 "
        "你 地 出 道 也 时 年 得 就 那 要 下 以 生 会 自 着 去 之 过 家 学 对"
    ).split(),
}
LANGS = sorted(VOCAB)
LANG_WEIGHTS = {"en": 0.40, "fr": 0.15, "es": 0.15, "de": 0.15, "zh": 0.15}

TOXIC_LEXICON: list[tuple[str, int]] = [
    ("blortug", 2), ("snekvarn", 1), ("drazzle", 1), ("fumpterous", 3),
    ("gribblenox", 2), ("vexmorden", 3), ("quazzpit", 1), ("smurdlap", 1),
    ("cronkforth", 2), ("plimbuzzle", 1), ("trogwaddle", 2), ("snibfrock", 1),
    ("mulchgrim", 3), ("zarfnickle", 1), ("gorpusflam", 2), ("dredgesnout", 3),
    ("wamblefitz", 1), ("pextrovane", 2), ("crudmonger", 3), ("flibbertigob", 1),
]

PAGES_FILTER_NAMES = FilterNames(
    {
        "t_acme": ["acme", "acme corp", "acme corporation"],
        "t_zorblax": ["zorblax", "zorblax industries"],
        "t_quintessa": ["quintessa", "quintessa holdings"],
        "t_meteo": ["météo plus"],
        "t_nordwind": ["nordwind ag"],
        "t_kappa": ["kappa systems", "kappa sys"],
        "t_orbital": ["orbital dynamics"],
        "t_phx_fund": ["phoenix group"],       # shared surface form:
        "t_phx_media": ["phoenix group"],      # two targets, one name
        "t_lyra": ["lyra", "lyra labs"],
        "t_vantage": ["vantage", "advantage partners"],
        "t_helios": ["helios energy"],
        "t_tidewater": ["tidewater shipping"],
        "t_kestrel": ["kestrel avionics", "kestrel"],
        "t_obsidian": ["obsidian software"],
    }
)

_PII_MAKERS = [
    lambda r: f"{_w(r)}{r.randrange(10, 99)}@{_w(r)}mail.com",
    lambda r: f"{r.randrange(200, 999)}-{r.randrange(200, 999)}-{r.randrange(1000, 9999)}",
    lambda r: f"{r.randrange(10, 250)}.{r.randrange(0, 255)}.{r.randrange(0, 255)}.{r.randrange(1, 254)}",
    lambda r: f"{r.randrange(100, 899)}-{r.randrange(10, 99)}-{r.randrange(1000, 9999)}",
]


def _w(rng: random.Random) -> str:
    return rng.choice(VOCAB["en"])


def _pick_lang(rng: random.Random) -> str:
    x = rng.random()
    acc = 0.0
    for lang in LANGS:
        acc += LANG_WEIGHTS[lang]
        if x < acc:
            return lang
    return LANGS[-1]


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    words = [rng.choice(VOCAB[lang]) for _ in range(n)]
    if lang != "zh":
        words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _prose(rng: random.Random, lang: str, n_words: int) -> list[str]:
    """Paragraph list; each paragraph 2-4 sentences of 8-15 words."""
    paras: list[str] = []
    made = 0
    while made < n_words:
        sents = []
        for _ in range(rng.randint(2, 4)):
            k = rng.randint(8, 15)
            sents.append(_sentence(rng, lang, k))
            made += k
        paras.append(" ".join(sents))
    return paras


def _gibberish_words(rng: random.Random, n: int) -> list[str]:
    cons = "bcdfghjklmnpqrstvwxz"
    out = []
    for i in range(n):
        if i % 9 == 4:
            out.append(rng.choice(["the", "and", "is", "of"]))
        else:
            out.append("".join(rng.choice(cons) for _ in range(rng.randint(4, 9))))
    return out


def _inject(rng: random.Random, paras: list[str], token: str) -> None:
    """Insert ``token`` at a random word position of a random paragraph."""
    i = rng.randrange(len(paras))
    words = paras[i].split(" ")
    pos = rng.randrange(len(words) + 1)
    words.insert(pos, token)
    paras[i] = " ".join(words)


def _page_html(rng: random.Random, paras: list[str], title: str) -> bytes:
    body = []
    for p in paras:
        esc = _htmllib.escape(p)
        body.append(f"<p>{esc}</p>")
        if rng.random() < 0.15:
            body.append("<!-- layout marker -->")
    script = "<script type='text/javascript'>var cfg = {a: 1, b: [2,3]};</script>"
    style = "<style>.c { color: red; } /* {nested} */</style>"
    return (
        f"<html><head><title>{_htmllib.escape(title)}</title>{script}{style}</head>"
        f"<body>{''.join(body)}</body></html>"
    ).encode("utf-8")


def make_pages(n: int, seed: int = 42) -> dict[str, list]:
    """Columns url, warc_ts (datetime), html (bytes), text, lang — plus no
    truth sidecar: truth is defined by the oracle, not the generator."""
    rng = random.Random(seed)
    hosts = [f"host{i:02d}.example.org" for i in range(50)]
    # Zipf-ish host weights: host00 takes ~30% of traffic (skew fixture)
    host_w = [1.0 / (i + 1) ** 1.1 for i in range(50)]
    tot = sum(host_w)
    host_w = [w / tot for w in host_w]
    base_ts = datetime(2024, 3, 1)

    urls: list[str] = []
    tss: list[datetime] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    names_flat = PAGES_FILTER_NAMES.names
    for i in range(n):
        lang = _pick_lang(rng)
        roll = rng.random()
        if roll < 0.04:
            paras = _prose(rng, lang, rng.randint(5, 35))
        elif roll < 0.05:
            paras = _prose(rng, lang, rng.randint(10500, 11500))
        elif roll < 0.09:
            paras = _prose(rng, lang, rng.randint(80, 300))
            for _ in range(rng.randint(10, 30)):
                _inject(rng, paras, rng.choice(["#", "...", "###"]))
        elif roll < 0.13:
            paras = ["- " + _sentence(rng, lang, rng.randint(3, 8)) for _ in range(rng.randint(20, 40))]
        elif roll < 0.18:
            words = _gibberish_words(rng, rng.randint(80, 250))
            paras = [" ".join(words[j : j + 12]) + "." for j in range(0, len(words), 12)]
        elif roll < 0.21:
            paras = _prose(rng, lang, rng.randint(80, 300))
            _inject(rng, paras, "lorem ipsum dolor sit amet")
        elif roll < 0.23:
            paras = _prose(rng, lang, rng.randint(80, 300))
            _inject(rng, paras, "{unrendered_template}")
        elif roll < 0.27:
            line = _sentence(rng, lang, rng.randint(6, 10))
            paras = _prose(rng, lang, rng.randint(60, 150)) + [line] * rng.randint(8, 15)
        elif roll < 0.30:
            paras = [
                " ".join(rng.choice(VOCAB[lang]) for _ in range(rng.randint(8, 14)))
                for _ in range(rng.randint(8, 16))
            ]
        else:
            paras = _prose(rng, lang, rng.randint(80, 600))

        if rng.random() < 0.08:
            for _ in range(rng.randint(1, 3)):
                _inject(rng, paras, _PII_MAKERS[rng.randrange(4)](rng))
        if rng.random() < 0.06:
            k = rng.choice([1, 1, 2, 3, 4, 5])
            for _ in range(k):
                _inject(rng, paras, TOXIC_LEXICON[rng.randrange(len(TOXIC_LEXICON))][0])
        if rng.random() < 0.12:
            for _ in range(rng.randint(1, 4)):
                form = rng.choice(names_flat)
                if rng.random() < 0.3:
                    form = form.title()
                _inject(rng, paras, form)

        host = rng.choices(hosts, weights=host_w, k=1)[0]
        if i > 10 and rng.random() < 0.03:
            url = urls[rng.randrange(max(0, i - 200), i)]  # duplicate url
        else:
            url = f"https://{host}/p/{i:07d}"
        ts = base_ts + timedelta(seconds=(i * 977) % (30 * 86400), microseconds=(i * 131) % 1_000_000)
        html_b = _page_html(rng, paras, f"page {i}")
        urls.append(url)
        tss.append(ts)
        htmls.append(html_b)
        texts.append(extract_text(html_b))
        wrong = rng.random() < 0.10
        langs.append(rng.choice([x for x in LANGS if x != lang]) if wrong else lang)

    return {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}


def write_pages_parquet(
    path: str, n: int, seed: int = 42, row_group_size: int = 4096
) -> str:
    """Write pages to a parquet file via pyarrow (no Spark needed).

    row_group_size matters: a row group is Spark's minimum scan-split
    unit, and pyarrow's default (1M rows) would put the whole corpus in
    ONE row group -> one scan task no matter the cluster size. Real
    crawl tables are many files x many row groups; 4096 keeps the test
    corpus splittable like production data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = make_pages(n, seed)
    table = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    )
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def write_pages_dir(
    path: str, n: int, seed: int = 42, files: int = 64, row_group_size: int = 1024
) -> str:
    """Write the same deterministic corpus as a DIRECTORY of ``files``
    parquet files — the realistic crawl layout (many chunk files), which
    lets Spark parallelize the scan with zero shuffle. One make_pages()
    call, sliced round-robin-free (contiguous slices keep it simple and
    deterministic)."""
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = make_pages(n, seed)
    d = pathlib.Path(path)
    d.mkdir(parents=True, exist_ok=True)
    per = (n + files - 1) // files
    for i in range(files):
        lo, hi = i * per, min((i + 1) * per, n)
        if lo >= hi:
            break
        table = pa.table(
            {
                "url": pa.array(cols["url"][lo:hi], pa.string()),
                "warc_ts": pa.array(cols["warc_ts"][lo:hi], pa.timestamp("us")),
                "html": pa.array(cols["html"][lo:hi], pa.binary()),
                "text": pa.array(cols["text"][lo:hi], pa.string()),
                "lang": pa.array(cols["lang"][lo:hi], pa.string()),
            }
        )
        pq.write_table(table, str(d / f"chunk-{i:04d}.parquet"),
                       row_group_size=row_group_size)
    return path


def training_corpus(n_per_lang: int = 200, seed: int = 1234) -> dict[str, list[str]]:
    """Clean per-language prose for langid/LM training — same generator
    family as the corpus, disjoint seed (train/eval separation)."""
    rng = random.Random(seed)
    return {
        lang: ["\n".join(_prose(rng, lang, rng.randint(100, 300))) for _ in range(n_per_lang)]
        for lang in LANGS
    }
