"""Single-node golden pipeline (the oracle the Spark engine is scored on).

Runs T1→T11 over a corpus in plain Python: extraction, tagging, nominal
coref, entity linking + NIL clustering (MinHash/LSH + union-find),
relation/event extraction, canonicalization.  Output is the golden
Cold-Start-style triple surface (/root/reference/README.md:46-49) the
distributed pipeline must match at P/R ≥ 0.95 (BASELINE.json:14).

Relational stages (linking joins, pair generation, components) are
implemented here INDEPENDENTLY of the Spark formulation (joins/groupBys)
— the point of the test: two formulations, one semantic.
"""

from __future__ import annotations

import hashlib
import zlib
from collections import defaultdict

from gaia_ref.extract import (
    extract_text,
    norm_surface,
    split_sentences,
    tokenize,
    tokenize_span,
)
from gaia_ref.gazetteer import (
    APPOSITIVE_PREDICATES,
    KB_ENTITIES,
    RELATION_PATTERNS,
)
from gaia_ref.minhashing import (
    CONTAINMENT_THRESHOLD,
    blocking_keys,
    char_shingles,
    shingle_containment,
)
from gaia_ref.tagging import Mention, connector_phrase, inter_tokens, tag_document

# ---------------------------------------------------------------------------


def is_heldout(url: str) -> bool:
    """20%-of-urls held-out split (SURVEY.md §5.2.1), crc32-stable."""
    return zlib.crc32(url.encode("utf-8")) % 5 == 0


def _alias_map() -> dict[str, list[tuple[float, str, str, str]]]:
    m: dict[str, list] = defaultdict(list)
    for eid, _n, coarse, fine, pop, aliases in KB_ENTITIES:
        if not eid:
            continue
        for a in aliases:
            m[norm_surface(a)].append((pop, eid, coarse, fine))
    return {k: sorted(v, reverse=True) for k, v in m.items()}


_ALIASES = _alias_map()

_PATTERNS: dict[tuple[str, str, str], tuple[str, float]] = {
    (s, p, o): (pred, conf) for s, p, o, pred, conf in RELATION_PATTERNS
}


def link_mention(coarse: str, surface: str) -> str | None:
    """KB link: max-(popularity, entity_id) candidate of matching coarse
    type, else None (NIL).  Same pinned rule as the Spark-side window."""
    for _pop, eid, c, _f in _ALIASES.get(norm_surface(surface), []):
        if c == coarse:
            return eid
    return None


def nil_cluster_ids(keys: set[tuple[str, str]]) -> dict[tuple[str, str], str]:
    """(coarse, norm_surface) → NIL cluster id via MinHash/LSH blocking +
    containment verification + union-find connected components."""
    items = sorted(keys)
    shingles = {k: char_shingles(k[1]) for k in items}
    blocks: dict[tuple[str, int], list] = defaultdict(list)
    for k in items:
        for bk in blocking_keys(k[1]):
            blocks[(k[0], bk)].append(k)
    parent = {k: k for k in items}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _bk, members in sorted(blocks.items()):
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if shingle_containment(shingles[a], shingles[b]) >= CONTAINMENT_THRESHOLD:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[tuple[str, str], list] = defaultdict(list)
    for k in items:
        clusters[find(k)].append(k)
    out = {}
    for members in clusters.values():
        rep = min(m[1] for m in members)
        cid = "NIL:" + hashlib.sha1(rep.encode("utf-8")).hexdigest()[:12]
        for m in members:
            out[m] = cid
    return out


def resolve_nominals(mentions: list[Mention]) -> list[tuple[Mention, Mention]]:
    """T5: each nominal → nearest preceding named mention of same coarse
    type; unresolved nominals are dropped.  Returns (mention, antecedent)
    pairs where antecedent == mention for named mentions."""
    ordered = sorted(mentions, key=lambda m: (m.sent_id, m.begin))
    out = []
    last_named: dict[str, Mention] = {}
    for m in ordered:
        if not m.nominal:
            out.append((m, m))
            last_named[m.coarse] = m
        else:
            ante = last_named.get(m.coarse)
            if ante is not None:
                out.append((m, ante))
    return out


def extract_doc_assertions(
    text: str,
    pretagged: tuple | None = None,
    preresolved: list | None = None,
) -> tuple[list[dict], list[dict]]:
    """Per-doc relations + events over resolved mentions.

    Returns (relation_rows, event_rows); subj/obj given as the *resolved
    surface mention* (coarse, fine, surface of the antecedent) — linking
    to canonical ids happens corpus-wide afterwards.

    ``pretagged=(mentions, triggers)`` skips the internal tag_document
    call when the caller already tagged the text (the fused Spark stage
    tags exactly once per document); ``preresolved`` likewise carries
    the caller's ``resolve_nominals(mentions)`` result (the fused
    stage's 's' row family computes it anyway — recomputing here was a
    second sort over every mention).
    """
    if pretagged is None:
        mentions, triggers = tag_document(text)
    else:
        mentions, triggers = pretagged
    resolved = (resolve_nominals(mentions)
                if preresolved is None else preresolved)
    sent_spans = {sid: (sb, se) for sid, sb, se in split_sentences(text)}

    by_sent: dict[int, list[tuple[Mention, Mention]]] = defaultdict(list)
    for m, ante in resolved:
        by_sent[m.sent_id].append((m, ante))
    for sid in by_sent:
        by_sent[sid].sort(key=lambda p: p[0].begin)

    relations: list[dict] = []
    for sid, pairs in sorted(by_sent.items()):
        sb, se = sent_spans[sid]
        n = len(pairs)
        stoks = tokenize_span(text, sb, se) if n > 1 else None
        adj = []  # (a_ante, b_ante, phrase, begins_with_comma)
        for i in range(n - 1):
            (m1, a1), (m2, a2) = pairs[i], pairs[i + 1]
            cp = connector_phrase(
                inter_tokens(text, sb, se, m1.end, m2.begin, stoks))
            adj.append((a1, a2, cp))
        for i, (a1, a2, cp) in enumerate(adj):
            if cp is None:
                continue
            phrase, _bc = cp
            hit = _PATTERNS.get((a1.coarse, phrase, a2.coarse))
            if hit:
                relations.append(
                    {"sent_id": sid, "subj_m": a1, "pred": hit[0],
                     "obj_m": a2, "conf": hit[1]}
                )
            # appositive propagation: (a , apposit b ,) verb c → (a verb c)
            if i + 1 < len(adj) and cp[1]:
                appos = _PATTERNS.get((a1.coarse, phrase, a2.coarse))
                if appos and appos[0] in APPOSITIVE_PREDICATES:
                    _b1, c1, cp2 = adj[i + 1]
                    if cp2 is not None:
                        hit2 = _PATTERNS.get((a1.coarse, cp2[0], c1.coarse))
                        if hit2:
                            relations.append(
                                {"sent_id": sid, "subj_m": a1,
                                 "pred": hit2[0], "obj_m": c1,
                                 "conf": hit2[1]}
                            )

    events: list[dict] = []
    for t in triggers:
        cands = by_sent.get(t.sent_id, [])
        left = [ (m, a) for m, a in cands
                 if m.end <= t.begin and a.coarse in t.left_types ]
        right = [ (m, a) for m, a in cands
                  if m.begin >= t.end and a.coarse in t.right_types ]
        if left and right:
            la = max(left, key=lambda p: p[0].end)[1]
            ra = min(right, key=lambda p: p[0].begin)[1]
            events.append(
                {"sent_id": t.sent_id, "subj_m": la,
                 "pred": "evt:" + t.fine_event, "obj_m": ra, "conf": t.conf}
            )
    return relations, events


def run_oracle(pages: list[dict]) -> dict:
    """pages: [{url, html, lang}] → golden texts, mentions, triples.

    Triples are canonical (subj/obj = KB entity_id or NIL cluster id),
    deduplicated per (url, sent_id, subj, pred, obj).
    """
    texts: dict[str, str] = {}
    doc_assertions: list[tuple[str, dict]] = []
    mention_rows: list[dict] = []
    nil_keys: set[tuple[str, str]] = set()

    for p in sorted(pages, key=lambda p: p["url"]):
        url = p["url"]
        text = extract_text(p["html"])
        texts[url] = text
        rels, evts = extract_doc_assertions(text)
        for r in rels + evts:
            doc_assertions.append((url, r))
        ms, _trigs = tag_document(text)
        for m, ante in resolve_nominals(ms):
            eid = link_mention(ante.coarse, ante.surface)
            if eid is None:
                nil_keys.add((ante.coarse, norm_surface(ante.surface)))
            mention_rows.append(
                {"url": url, "sent_id": m.sent_id, "begin": m.begin,
                 "end": m.end, "surface": m.surface, "coarse": m.coarse,
                 "fine": ante.fine, "nominal": m.nominal,
                 "ante_surface": ante.surface, "entity_id": eid}
            )

    nil_ids = nil_cluster_ids(nil_keys)

    def canon(m: Mention) -> str:
        eid = link_mention(m.coarse, m.surface)
        if eid is not None:
            return eid
        return nil_ids[(m.coarse, norm_surface(m.surface))]

    triples = set()
    for url, r in doc_assertions:
        subj_m, obj_m = r["subj_m"], r["obj_m"]
        triples.add(
            (url, r["sent_id"], canon(subj_m), r["pred"], canon(obj_m),
             subj_m.fine, obj_m.fine, r["conf"])
        )
    triple_rows = [
        {"url": u, "sent_id": s, "subj": sj, "pred": pr, "obj": ob,
         "subj_type": st, "obj_type": ot, "conf": cf}
        for u, s, sj, pr, ob, st, ot, cf in sorted(triples)
    ]
    return {"texts": texts, "mentions": mention_rows, "triples": triple_rows}
