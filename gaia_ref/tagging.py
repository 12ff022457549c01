"""T2/T3/T7 tagging core — shared verbatim by oracle and Spark UDFs.

Deterministic gazetteer longest-match mention tagger + trigger detector
(the stand-in for GAIA's ELMo-LSTM-CRF extractor and Bi-LSTM-CRF trigger
extractor, SURVEY.md §2.2 T2/T7).  Operates on the canonical extracted
text so char offsets (ltf-style provenance,
/root/reference/README.md:44) are identical on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass

from gaia_ref.extract import (
    _LEAD_PUNCT_RE,
    _TRAIL_PUNCT_RE,
    split_sentences,
    tokenize,
)
from gaia_ref.gazetteer import EVENT_TRIGGERS, KB_ENTITIES, NOMINALS


@dataclass(frozen=True)
class Mention:
    sent_id: int
    begin: int
    end: int
    surface: str
    coarse: str
    fine: str
    nominal: bool


@dataclass(frozen=True)
class Trigger:
    sent_id: int
    begin: int
    end: int
    token: str            # lowercased core token
    coarse_event: str
    fine_event: str
    left_role: str
    left_types: frozenset
    right_role: str
    right_types: frozenset
    conf: float


def _core(token: str) -> str:
    return _LEAD_PUNCT_RE.sub("", _TRAIL_PUNCT_RE.sub("", token))


def _core_span(tb: int, token: str) -> tuple[int, int, str]:
    """(begin, end, core) of the punct-stripped token within the text."""
    lead = _LEAD_PUNCT_RE.match(token)
    lo = lead.end() if lead else 0
    stripped = _TRAIL_PUNCT_RE.sub("", token)
    hi = len(stripped)
    if hi < lo:  # all-punct token → empty core at its start
        return tb, tb, ""
    return tb + lo, tb + hi, token[lo:hi]


def _build_lexicon() -> tuple[dict, dict, int]:
    """named: core-token-tuple (cased) → (coarse, fine); ambiguous surfaces
    resolve to the owning entity with max (popularity, entity_id) — pinned
    so e.g. 'Columbia' tags as ORG.Educational (Q2013 beats Q3011).
    nominal: lowercased core-token-tuple → coarse."""
    best: dict[tuple, tuple[float, str, str, str]] = {}
    for eid, _n, coarse, fine, pop, aliases in KB_ENTITIES:
        for a in aliases:
            key = tuple(c for c in (_core(t) for t in a.split()) if c)
            if not key:
                continue
            cand = (pop, eid, coarse, fine)
            if key not in best or cand > best[key]:
                best[key] = cand
    named = {k: (v[2], v[3]) for k, v in best.items()}
    nominal = {
        tuple(s.lower().split()): coarse for s, coarse in NOMINALS.items()
    }
    max_len = max(
        max((len(k) for k in named), default=1),
        max((len(k) for k in nominal), default=1),
    )
    return named, nominal, max_len


_NAMED, _NOMINAL, _MAX_LEN = _build_lexicon()


def tag_document(text: str) -> tuple[list[Mention], list[Trigger]]:
    """Greedy longest-match tagging over every sentence of ``text``."""
    mentions: list[Mention] = []
    triggers: list[Trigger] = []
    for sid, sb, se in split_sentences(text):
        toks = tokenize(text[sb:se], base=sb)
        cores = [_core_span(tb, tok) for tb, _te, tok in toks]
        n = len(toks)
        consumed = [False] * n
        i = 0
        while i < n:
            if not cores[i][2]:
                i += 1
                continue
            matched = False
            for k in range(min(_MAX_LEN, n - i), 0, -1):
                seq = [cores[j][2] for j in range(i, i + k)]
                if any(not c for c in seq):
                    continue
                key = tuple(seq)
                if key in _NAMED:
                    coarse, fine = _NAMED[key]
                    b, e = cores[i][0], cores[i + k - 1][1]
                    mentions.append(
                        Mention(sid, b, e, text[b:e], coarse, fine, False)
                    )
                    for j in range(i, i + k):
                        consumed[j] = True
                    i += k
                    matched = True
                    break
                lkey = tuple(s.lower() for s in seq)
                if lkey in _NOMINAL:
                    coarse = _NOMINAL[lkey]
                    b, e = cores[i][0], cores[i + k - 1][1]
                    mentions.append(
                        Mention(sid, b, e, text[b:e], coarse, coarse, True)
                    )
                    for j in range(i, i + k):
                        consumed[j] = True
                    i += k
                    matched = True
                    break
            if not matched:
                i += 1
        for idx, (tb, _te, tok) in enumerate(toks):
            if consumed[idx]:
                continue
            cb, ce, core = _core_span(tb, tok)
            trig = EVENT_TRIGGERS.get(core.lower())
            if trig:
                coarse_ev, fine_ev, lrole, ltypes, rrole, rtypes, conf = trig
                triggers.append(
                    Trigger(sid, cb, ce, core.lower(), coarse_ev, fine_ev,
                            lrole, ltypes, rrole, rtypes, conf)
                )
    return mentions, triggers


def inter_tokens(text: str, sb: int, se: int, lo: int, hi: int) -> list[str]:
    """Raw tokens of sentence [sb,se) strictly between char offsets lo, hi."""
    return [
        tok for tb, te, tok in tokenize(text[sb:se], base=sb)
        if tb >= lo and te <= hi
    ]


MAX_CONNECTOR_TOKENS = 6


def connector_phrase(raw: list[str]) -> tuple[str, bool] | None:
    """(comma-stripped lowercase phrase, begins_with_comma) or None if the
    gap is too wide.  Pinned cap bounds the T6 self-join at scale."""
    if len(raw) > MAX_CONNECTOR_TOKENS:
        return None
    begins_with_comma = bool(raw) and raw[0] == ","
    parts = [c.lower() for c in (_core(t) for t in raw) if c]
    return " ".join(parts), begins_with_comma
