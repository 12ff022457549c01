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
    _TOKEN_RE,
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


# str.strip char-classes identical to _LEAD_PUNCT_RE / _TRAIL_PUNCT_RE:
# both remove the maximal run of class characters from that end, but
# lstrip/rstrip are C-speed (≈8× the two regex subs on this hot path).
_LEAD_CHARS = "([\"'"
_TRAIL_CHARS = ".,;:!?)]\"'"


def _core(token: str) -> str:
    return token.lstrip(_LEAD_CHARS).rstrip(_TRAIL_CHARS)


def _core_span(tb: int, token: str) -> tuple[int, int, str]:
    """(begin, end, core) of the punct-stripped token within the text."""
    lo = len(token) - len(token.lstrip(_LEAD_CHARS))
    hi = len(token.rstrip(_TRAIL_CHARS))
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

# first-token gate: a position can only start a match if some lexicon
# key could begin at it; the per-first-token max key length bounds the
# k-descent.  Pure lookup-pruning — the candidate set per position is
# unchanged.  Single gate keyed by the LOWERCASED first core: max key
# length over named keys (any casing of their first token) and nominal
# keys starting there.  Lowercasing the named side only loosens the
# cap — pruning stays sound because an actual match still requires the
# cased key in _NAMED — and ONE probe replaces the former two
# (_KMAX_NAMED cased + _KMAX_NOMINAL lowered), measured ~4% of the
# kernel on gate-miss tokens.
_GATE: dict[str, int] = {}
for _k in _NAMED:
    _f = _k[0].lower()
    _GATE[_f] = max(_GATE.get(_f, 0), len(_k))
for _k in _NOMINAL:
    _GATE[_k[0]] = max(_GATE.get(_k[0], 0), len(_k))


def tag_document(text: str) -> tuple[list[Mention], list[Trigger]]:
    """Greedy longest-match tagging over every sentence of ``text``."""
    mentions: list[Mention] = []
    triggers: list[Trigger] = []
    for sid, sb, se in split_sentences(text):
        # tokenization fused with the (inlined) _core_span pass: one
        # finditer loop builds the cores table directly.  The former
        # intermediate (begin, end, token) tuple list (tokenize_span)
        # profiled at ~16% of the kernel and nothing below used it
        # beyond its length — the trigger loop reads cores/consumed by
        # index.  Core math kept line-for-line identical to _core_span.
        cores = []
        for m in _TOKEN_RE.finditer(text, sb, se):
            tok = m.group(0)
            tb = m.start()
            lo = len(tok) - len(tok.lstrip(_LEAD_CHARS))
            hi = len(tok.rstrip(_TRAIL_CHARS))
            cores.append((tb, tb, "") if hi < lo
                         else (tb + lo, tb + hi, tok[lo:hi]))
        n = len(cores)
        consumed = [False] * n
        i = 0
        while i < n:
            c0 = cores[i][2]
            if not c0:
                i += 1
                continue
            # k-descent pruning: cap k by the longest lexicon key
            # whose first token lowercases to this core (0 → no key
            # can match here), and
            # truncate the window at the first empty core (the original
            # loop `continue`d every k spanning one).  Same matches,
            # ~10× fewer tuple builds + dict probes.
            kcap = _GATE.get(c0.lower(), 0)
            if not kcap:
                i += 1
                continue
            kcap = min(kcap, n - i)
            window = [cores[j][2] for j in range(i, i + kcap)]
            for d in range(kcap):
                if not window[d]:
                    kcap = d
                    break
            matched = False
            for k in range(kcap, 0, -1):
                key = tuple(window[:k])
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
                lkey = tuple(s.lower() for s in key)
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
        for idx in range(n):
            if consumed[idx]:
                continue
            cb, ce, core = cores[idx]
            trig = EVENT_TRIGGERS.get(core.lower())
            if trig:
                coarse_ev, fine_ev, lrole, ltypes, rrole, rtypes, conf = trig
                triggers.append(
                    Trigger(sid, cb, ce, core.lower(), coarse_ev, fine_ev,
                            lrole, ltypes, rrole, rtypes, conf)
                )
    return mentions, triggers


def inter_tokens(text: str, sb: int, se: int, lo: int, hi: int,
                 toks: list | None = None) -> list[str]:
    """Raw tokens of sentence [sb,se) strictly between char offsets lo, hi.

    ``toks`` may carry the sentence's precomputed ``tokenize(text[sb:se],
    base=sb)`` so callers iterating adjacent mention pairs tokenize each
    sentence once instead of once per pair."""
    if toks is None:
        toks = tokenize(text[sb:se], base=sb)
    return [tok for tb, te, tok in toks if tb >= lo and te <= hi]


MAX_CONNECTOR_TOKENS = 6


def connector_phrase(raw: list[str]) -> tuple[str, bool] | None:
    """(comma-stripped lowercase phrase, begins_with_comma) or None if the
    gap is too wide.  Pinned cap bounds the T6 self-join at scale."""
    if len(raw) > MAX_CONNECTOR_TOKENS:
        return None
    begins_with_comma = bool(raw) and raw[0] == ","
    parts = [c.lower() for c in (_core(t) for t in raw) if c]
    return " ".join(parts), begins_with_comma
