"""Deterministic synthetic web-page corpus with closed-form golden facts.

Every page is a pure function of (seed, row index): reproducible across
runs, machines, and Python hash seeds (no str-hash dependence — only
``random.Random`` seeded with integers).  Analog of the reference's
ltf/rsd dry-run corpus (/root/reference/README.md:44).
"""

from __future__ import annotations

import datetime as dt
import random

from gaia_ref.gazetteer import KB_ENTITIES, LANGS, kb_rows, alias_rows

# entity surfaces by coarse type (aliases incl. NIL-only entities)
_BY_TYPE: dict[str, list[str]] = {}
for _eid, _name, _coarse, _fine, _pop, _aliases in KB_ENTITIES:
    _BY_TYPE.setdefault(_coarse, []).extend(_aliases)
for _k in _BY_TYPE:
    _BY_TYPE[_k] = sorted(set(_BY_TYPE[_k]))

# Relation-bearing sentence templates → connector phrases the T6 pattern
# table recognizes (gaia_ref/gazetteer.py RELATION_PATTERNS).
_REL_TEMPLATES = [
    "{PER} visited {GPE} .",
    "{PER} is the head of {ORG} .",
    "{PER} , head of {ORG} , visited {GPE} .",
    "{PER} was born in {GPE} .",
    "{ORG} is based in {GPE} .",
    "{PER} met with {PER2} .",
    "{PER} works for {ORG} .",
    "{ORG} is a subsidiary of {ORG2} .",
    "{PER} lives in {GPE} .",
    "{FAC} is located in {GPE} .",
    "{ORG} opened an office in {GPE} .",
    "{PER} is a professor at {ORG} .",
]
_EVT_TEMPLATES = [
    "{ORG} acquired {ORG2} last week .",
    "{PER} attacked {GPE} yesterday .",
    "{GPE} bombed {FAC} overnight .",
    "{PER} founded {ORG} in 1999 .",
    "{GPE} arrested {PER} at dawn .",
    "{GPE} elected {PER} on Sunday .",
    "{ORG} sued {ORG2} over patents .",
    "{GPE} fined {ORG} heavily .",
]
# (first sentence, nominal follow-up) pairs — exercises T5 coref
_NOMINAL_TEMPLATES = [
    ("{ORG} is based in {GPE} .", "The company opened an office in {GPE2} ."),
    ("{PER} visited {GPE} .", "The president met with {PER2} ."),
    ("{ORG} acquired {ORG2} last week .", "The company is based in {GPE} ."),
    ("{PER} works for {ORG} .", "The journalist visited {GPE} ."),
]

_FILLER_VOCAB = (
    "meanwhile analysts noted the broader market trend remained stable "
    "despite ongoing uncertainty about regional supply chains and weather "
    "several observers described the situation as fluid while officials "
    "declined further comment pending review of preliminary findings"
).split()
_FILLER_UNICODE = ["café", "naïve", "coöperate", "résumé", "😀", "Straße",
                   "étude", "пример", "текст", "übrig"]

_DOMAINS = ["hotnews.example"] + [f"site{i:02d}.example" for i in range(1, 50)]

_EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _pick(rng: random.Random, coarse: str) -> str:
    return rng.choice(_BY_TYPE[coarse])


def _fill(rng: random.Random, template: str) -> str:
    out = template
    # distinct second entity of same type where the template asks for one
    for slot, coarse in (("{PER2}", "PER"), ("{ORG2}", "ORG"), ("{GPE2}", "GPE")):
        if slot in out:
            out = out.replace(slot, _pick(rng, coarse))
    for slot, coarse in (("{PER}", "PER"), ("{ORG}", "ORG"),
                         ("{GPE}", "GPE"), ("{FAC}", "FAC")):
        if slot in out:
            out = out.replace(slot, _pick(rng, coarse))
    return out


def _filler_sentence(rng: random.Random, lang: str) -> str:
    n = rng.randint(4, 10)
    words = [rng.choice(_FILLER_VOCAB) for _ in range(n)]
    if rng.random() < 0.25:
        words.insert(rng.randrange(len(words)), rng.choice(_FILLER_UNICODE))
    return " ".join(words) + " ."


def page_sentences(i: int, seed: int = 42,
                   sents: tuple[int, int] = (1, 20)) -> list[str]:
    """Pure function (seed, i, sents) → the page's planted sentences.

    ``sents`` bounds the per-page sentence count: the default matches
    the original short-page fixture; pass e.g. (10, 60) for
    realistic Common-Crawl-length pages (bench/scaling corpora).
    """
    rng = random.Random((seed << 32) ^ (i * 2654435761 % (1 << 61)))
    lang = page_lang(i, seed)
    n = rng.randint(*sents)
    out: list[str] = []
    while len(out) < n:
        r = rng.random()
        if r < 0.45:
            out.append(_fill(rng, rng.choice(_REL_TEMPLATES)))
        elif r < 0.65:
            out.append(_fill(rng, rng.choice(_EVT_TEMPLATES)))
        elif r < 0.80:
            first, follow = rng.choice(_NOMINAL_TEMPLATES)
            out.append(_fill(rng, first))
            out.append(_fill(rng, follow))
        else:
            out.append(_filler_sentence(rng, lang))
    return out[:n] if n > 1 else out


def page_lang(i: int, seed: int = 42) -> str:
    rng = random.Random((seed << 16) ^ i)
    r = rng.random()
    if r < 0.40:
        return "en"
    return LANGS[1 + int((r - 0.40) / 0.15) % 4]


def page_domain(i: int, seed: int = 42) -> str:
    """Zipf-ish skew: top domain ≈ 30% of rows (salting exercise)."""
    rng = random.Random((seed << 8) ^ (i * 40503))
    if rng.random() < 0.30:
        return _DOMAINS[0]
    # zipf over the tail
    weights = [1.0 / (k + 1) for k in range(1, len(_DOMAINS))]
    return rng.choices(_DOMAINS[1:], weights=weights, k=1)[0]


def _wrap_html(rng: random.Random, sentences: list[str], title: str) -> bytes:
    """Adversarial HTML wrapper: the planted sentences must round-trip
    through extract_text as clean lines; everything else is noise."""
    parts = ["<!DOCTYPE html>", "<html>", "<head>",
             f"<title>{title}</title>"]
    if rng.random() < 0.5:
        parts.append("<style>body { color: #222; }\n.x{display:none}</style>")
    if rng.random() < 0.5:
        parts.append("<script>var x = '<p>not text</p>'; if (x < 3) {}</script>")
    parts.append("</head>")
    parts.append("<body>")
    if rng.random() < 0.4:
        parts.append("<!-- generated page -->")
    if rng.random() < 0.3:
        parts.append("<div class=\"nav\"><span>home</span>&nbsp;&middot;&nbsp;"
                     "<span>news &amp; analysis</span></div>")
    for s in sentences:
        decor = rng.random()
        if decor < 0.15:
            parts.append(f"<div><p>  {s}  </p></div>")
        elif decor < 0.30:
            parts.append(f"<p>{s.replace(' and ', ' &amp; ')}</p>")
        elif decor < 0.40:
            parts.append(f"<p><b>{s}</b></p>")
        else:
            parts.append(f"<p>{s}</p>")
    if rng.random() < 0.25:
        parts.append("<p>broken entity &amp;x and &unknowny; stay literal</p>")
    if rng.random() < 0.2:
        parts.append("<p>café vs café needs NFC &#128512;</p>")
    parts.append("</body></html>")
    joiner = "\r\n" if rng.random() < 0.3 else "\n"
    return joiner.join(parts).encode("utf-8")


def gen_pages(n: int, seed: int = 42,
              sents: tuple[int, int] = (1, 20)) -> list[dict]:
    """n pages: [{url, warc_ts, html, text, lang}]. ~5% near-duplicates
    (i % 20 == 19 reuses page i-1's sentences, shuffled)."""
    out = []
    for i in range(n):
        rng = random.Random((seed << 24) ^ (i * 1099511628211 % (1 << 61)))
        lang = page_lang(i, seed)
        domain = page_domain(i, seed)
        if i % 20 == 19 and i > 0:
            s = list(page_sentences(i - 1, seed, sents))
            rng.shuffle(s)
            if s and rng.random() < 0.5:
                s[0] = s[0].replace(" .", " indeed .")
            sents_i = s
        else:
            sents_i = page_sentences(i, seed, sents)
        url = f"https://{domain}/{lang}/art-{i:08d}"
        ts = _EPOCH + dt.timedelta(seconds=(i * 9973) % (30 * 86400))
        html = _wrap_html(rng, sents_i, title=f"article {i}")
        out.append({"url": url, "warc_ts": ts, "html": html,
                    "text": None, "lang": lang})
    return out


def write_corpus(out_dir: str, n: int, seed: int = 42,
                 sents: tuple[int, int] = (1, 20)) -> None:
    """Write pages/kb_entities/kb_aliases/page_meta parquet into out_dir."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages = gen_pages(n, seed, sents)
    t = pa.table({
        "url": pa.array([p["url"] for p in pages], pa.string()),
        "warc_ts": pa.array([p["warc_ts"] for p in pages],
                            pa.timestamp("us", tz="UTC")),
        "html": pa.array([p["html"] for p in pages], pa.binary()),
        "text": pa.array([p["text"] for p in pages], pa.string()),
        "lang": pa.array([p["lang"] for p in pages], pa.string()),
    })
    # small row groups: parquet splits only at row-group boundaries, so
    # a single default-sized group would make the scan single-task no
    # matter the cluster size (row_group_size is the split unit)
    pq.write_table(t, os.path.join(out_dir, "pages.parquet"),
                   row_group_size=2000)

    kb = kb_rows()
    pq.write_table(pa.table({
        "entity_id": pa.array([r[0] for r in kb], pa.string()),
        "canonical_name": pa.array([r[1] for r in kb], pa.string()),
        "entity_type": pa.array([r[2] for r in kb], pa.string()),
        "fine_type": pa.array([r[3] for r in kb], pa.string()),
        "popularity": pa.array([r[4] for r in kb], pa.float64()),
    }), os.path.join(out_dir, "kb_entities.parquet"))

    al = alias_rows()
    pq.write_table(pa.table({
        "alias_norm": pa.array([r[0] for r in al], pa.string()),
        "entity_id": pa.array([r[1] for r in al], pa.string()),
    }), os.path.join(out_dir, "kb_aliases.parquet"))

    # page_meta: parent_child_tab analog (/root/reference/README.md:44)
    pq.write_table(pa.table({
        "child_uid": pa.array([p["url"] for p in pages], pa.string()),
        "parent_uid": pa.array(
            [p["url"].split("/")[2] for p in pages], pa.string()),
        "content_date": pa.array(
            [p["warc_ts"].date() for p in pages], pa.date32()),
    }), os.path.join(out_dir, "page_meta.parquet"))
