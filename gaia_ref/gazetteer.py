"""Shared lexicons: entity gazetteer, relation connectors, event triggers.

These play the role of the reference's trained extractors — the
ELMo-LSTM-CRF mention extractor, CNN relation extractor, and Bi-LSTM-CRF
trigger extractor named on the GAIA architecture diagram
(/root/reference/data/images/overview_all.png) and README task list
(/root/reference/README.md:42).  The real models live in external Docker
images (/root/reference/README.md:22-23), so a deterministic
gazetteer+rule system stands in (SURVEY.md §2.2 T2/T6/T7): same dataflow
shape, closed-form answers, exactly reproducible on both the single-node
oracle and the distributed Spark pipeline.

Everything here is a pinned constant. The Spark side broadcasts these
tables; the oracle reads them directly.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Entity gazetteer: (entity_id, canonical_name, coarse, fine, popularity,
#                    aliases).  entity_id == "" marks corpus-only entities
# that are NOT in the background KB → they must come out as NIL clusters
# (reference: "NIL Clustering", diagram; LORELEI KB at README.md:128).
# ---------------------------------------------------------------------------
KB_ENTITIES: list[tuple[str, str, str, str, float, list[str]]] = [
    # --- persons -----------------------------------------------------------
    ("Q1001", "Viktor Orlov", "PER", "PER.Politician", 9.1,
     ["Viktor Orlov", "Orlov", "President Orlov"]),
    ("Q1002", "Maria Kovac", "PER", "PER.Politician", 8.4,
     ["Maria Kovac", "Kovac", "Chancellor Kovac"]),
    ("Q1003", "Elena Petrova", "PER", "PER.Journalist", 6.2,
     ["Elena Petrova", "Petrova"]),
    ("Q1004", "Anders Lindqvist", "PER", "PER.Businessperson", 7.0,
     ["Anders Lindqvist", "Lindqvist", "A. Lindqvist"]),
    ("Q1005", "Tomas Marek", "PER", "PER.Scientist", 5.5,
     ["Tomas Marek", "Marek", "Dr. Marek"]),
    ("Q1006", "Ivan Melnyk", "PER", "PER.Politician", 6.8,
     ["Ivan Melnyk", "Melnyk", "Minister Melnyk"]),
    ("Q1007", "Sofia Rinaldi", "PER", "PER.Businessperson", 6.1,
     ["Sofia Rinaldi", "Rinaldi"]),
    ("Q1008", "Pavel Donchev", "PER", "PER.Militant", 4.9,
     ["Pavel Donchev", "Donchev", "Commander Donchev"]),
    ("Q1009", "Greta Haas", "PER", "PER.Politician", 7.7,
     ["Greta Haas", "Haas", "Mayor Haas"]),
    ("Q1010", "Omar Sayed", "PER", "PER.Journalist", 5.8,
     ["Omar Sayed", "Sayed"]),
    ("Q1011", "Lucia Fernandez", "PER", "PER.Scientist", 6.4,
     ["Lucia Fernandez", "Fernandez", "Prof. Fernandez"]),
    ("Q1012", "Dmitri Volkov", "PER", "PER.Businessperson", 7.3,
     ["Dmitri Volkov", "Volkov"]),
    # --- organizations -----------------------------------------------------
    ("Q2001", "Novaya Gazeta Group", "ORG", "ORG.NewsMedia", 8.8,
     ["Novaya Gazeta Group", "Novaya Gazeta", "NGG"]),
    ("Q2002", "International Business Machines", "ORG", "ORG.Company", 9.5,
     ["International Business Machines", "IBM", "I.B.M."]),
    ("Q2003", "Danube Steel Works", "ORG", "ORG.Company", 7.2,
     ["Danube Steel Works", "Danube Steel", "DSW"]),
    ("Q2004", "Helios Energy", "ORG", "ORG.Company", 7.9,
     ["Helios Energy", "Helios"]),
    ("Q2005", "Carpathia Bank", "ORG", "ORG.FinancialInstitution", 8.1,
     ["Carpathia Bank", "Carpathia"]),
    ("Q2006", "United Transport Alliance", "ORG", "ORG.Association", 6.6,
     ["United Transport Alliance", "UTA"]),
    ("Q2007", "Baltic Research Institute", "ORG", "ORG.Educational", 6.9,
     ["Baltic Research Institute", "BRI"]),
    ("Q2008", "Vostok Media", "ORG", "ORG.NewsMedia", 7.4,
     ["Vostok Media", "Vostok"]),
    ("Q2009", "Atlas Mining Corporation", "ORG", "ORG.Company", 7.1,
     ["Atlas Mining Corporation", "Atlas Mining", "AMC"]),
    ("Q2010", "Northern Grid Authority", "ORG", "ORG.Government", 6.3,
     ["Northern Grid Authority", "NGA"]),
    ("Q2011", "Crescent Airways", "ORG", "ORG.Company", 7.6,
     ["Crescent Airways", "Crescent"]),
    ("Q2012", "Phoenix Capital Partners", "ORG", "ORG.FinancialInstitution", 6.7,
     ["Phoenix Capital Partners", "Phoenix Capital"]),
    # --- geopolitical entities ---------------------------------------------
    ("Q3001", "Kyiv", "GPE", "GPE.City", 9.0, ["Kyiv", "Kiev"]),
    ("Q3002", "Odessa", "GPE", "GPE.City", 8.2, ["Odessa", "Odesa"]),
    ("Q3003", "Moscow", "GPE", "GPE.City", 9.3, ["Moscow"]),
    ("Q3004", "Berlin", "GPE", "GPE.City", 9.1, ["Berlin"]),
    ("Q3005", "Madrid", "GPE", "GPE.City", 8.9, ["Madrid"]),
    ("Q3006", "Lviv", "GPE", "GPE.City", 7.8, ["Lviv", "Lvov"]),
    ("Q3007", "Warsaw", "GPE", "GPE.City", 8.6, ["Warsaw"]),
    ("Q3008", "Bucharest", "GPE", "GPE.City", 8.0, ["Bucharest"]),
    ("Q3009", "Tallinn", "GPE", "GPE.City", 7.5, ["Tallinn"]),
    ("Q3010", "Geneva", "GPE", "GPE.City", 8.4, ["Geneva"]),
    # "Columbia" is deliberately ambiguous: city vs. university ------------
    ("Q3011", "Columbia", "GPE", "GPE.City", 5.0, ["Columbia"]),
    ("Q2013", "Columbia University", "ORG", "ORG.Educational", 8.7,
     ["Columbia University", "Columbia"]),
    # --- facilities / locations -------------------------------------------
    ("Q4001", "Danube Bridge", "FAC", "FAC.Structure", 5.2, ["Danube Bridge"]),
    ("Q4002", "Port of Odessa", "FAC", "FAC.Port", 6.0, ["Port of Odessa"]),
    ("Q4003", "Carpathian Mountains", "LOC", "LOC.Region", 6.5,
     ["Carpathian Mountains", "Carpathians"]),
    # --- corpus-only (NIL) entities: absent from the background KB --------
    ("", "Zorian Balaban", "PER", "PER.Activist", 0.0,
     ["Zorian Balaban", "Balaban"]),
    ("", "Kestrel Logistics", "ORG", "ORG.Company", 0.0,
     ["Kestrel Logistics", "Kestrel"]),
    ("", "Mira Holzmann", "PER", "PER.Activist", 0.0,
     ["Mira Holzmann", "Holzmann"]),
    ("", "Quarry Hill Collective", "ORG", "ORG.Association", 0.0,
     ["Quarry Hill Collective", "Quarry Hill"]),
]

# Nominal anaphors (T5, "Contextual Nominal Coreference" on the diagram):
# surface → coarse type it can corefer with.
NOMINALS: dict[str, str] = {
    "the company": "ORG",
    "the organization": "ORG",
    "the bank": "ORG",
    "the president": "PER",
    "the minister": "PER",
    "the journalist": "PER",
    "the city": "GPE",
}

# ---------------------------------------------------------------------------
# Relation connectors (T6).  Matching rule (pinned, §oracle + Spark T6):
# for ADJACENT same-sentence mention pairs (no mention between them), the
# inter-mention token sequence with commas stripped and norm-cased must
# equal `phrase`; subj/obj coarse types must match.  conf is fixed per
# pattern (the reference emits per-assertion confidences in .cs lines,
# /root/reference/README.md:46-49).
# ---------------------------------------------------------------------------
RELATION_PATTERNS: list[tuple[str, str, str, str, float]] = [
    # (subj_coarse, phrase, obj_coarse, predicate, conf)
    ("PER", "is the head of", "ORG", "PersonalSocial.LeaderOf", 0.95),
    ("PER", "head of", "ORG", "PersonalSocial.LeaderOf", 0.90),
    ("PER", "visited", "GPE", "Physical.Visited", 0.92),
    ("PER", "was born in", "GPE", "Physical.BornIn", 0.96),
    ("ORG", "is based in", "GPE", "GeneralAffiliation.BasedIn", 0.94),
    ("PER", "met with", "PER", "PersonalSocial.MetWith", 0.91),
    ("PER", "works for", "ORG", "OrganizationAffiliation.EmployeeOf", 0.93),
    ("ORG", "is a subsidiary of", "ORG", "PartWhole.Subsidiary", 0.95),
    ("PER", "lives in", "GPE", "Physical.Resident", 0.90),
    ("FAC", "is located in", "GPE", "Physical.LocatedIn", 0.94),
    ("LOC", "is located in", "GPE", "Physical.LocatedIn", 0.94),
    ("ORG", "opened an office in", "GPE", "GeneralAffiliation.BasedIn", 0.88),
    ("PER", "is a professor at", "ORG", "OrganizationAffiliation.EmployeeOf", 0.92),
]

# Appositive connectors: ", head of X ," binds the appositive's subject to
# the relation that follows (lets "{PER} , head of {ORG} , visited {GPE}"
# yield BOTH (PER leaderOf ORG) and (PER visited GPE)).
APPOSITIVE_PREDICATES = frozenset({"PersonalSocial.LeaderOf"})

# ---------------------------------------------------------------------------
# Event triggers (T7) — trigger token (lowercased) → (coarse event type,
# fine event type, role of nearest-left arg, allowed left types,
# role of nearest-right arg, allowed right types, conf).
# Mirrors GAIA's trigger→argument decomposition ("Bi-LSTM CRFs Trigger
# Extractor" + "CNN Argument Extractor", diagram).
# ---------------------------------------------------------------------------
EVENT_TRIGGERS: dict[str, tuple[str, str, str, frozenset, str, frozenset, float]] = {
    "acquired": ("Transaction", "Transaction.Acquire", "buyer",
                 frozenset({"ORG", "PER"}), "target", frozenset({"ORG"}), 0.90),
    "attacked": ("Conflict", "Conflict.Attack", "attacker",
                 frozenset({"PER", "ORG", "GPE"}), "target",
                 frozenset({"PER", "ORG", "GPE", "FAC"}), 0.91),
    "bombed": ("Conflict", "Conflict.Attack.Bombing", "attacker",
               frozenset({"PER", "ORG", "GPE"}), "target",
               frozenset({"PER", "ORG", "GPE", "FAC"}), 0.93),
    "founded": ("Business", "Business.Found", "founder",
                frozenset({"PER"}), "org", frozenset({"ORG"}), 0.92),
    "arrested": ("Justice", "Justice.Arrest", "agent",
                 frozenset({"PER", "ORG", "GPE"}), "person",
                 frozenset({"PER"}), 0.94),
    "elected": ("Personnel", "Personnel.Elect", "electorate",
                frozenset({"GPE", "ORG"}), "person", frozenset({"PER"}), 0.90),
    "sued": ("Justice", "Justice.Sue", "plaintiff",
             frozenset({"PER", "ORG"}), "defendant",
             frozenset({"PER", "ORG"}), 0.89),
    "fined": ("Justice", "Justice.Fine", "adjudicator",
              frozenset({"ORG", "GPE"}), "entity",
              frozenset({"PER", "ORG"}), 0.88),
}

LANGS = ["en", "ru", "uk", "es", "de"]


def kb_rows() -> list[tuple[str, str, str, str, float]]:
    """KB-resident entities only (the broadcastable kb_entities table)."""
    return [(eid, name, coarse, fine, pop)
            for eid, name, coarse, fine, pop, _ in KB_ENTITIES if eid]


def alias_rows() -> list[tuple[str, str]]:
    """(alias_norm, entity_id) exploded view for the broadcast alias join."""
    from gaia_ref.extract import norm_surface
    out = []
    for eid, _name, _coarse, _fine, _pop, aliases in KB_ENTITIES:
        if eid:
            for a in aliases:
                out.append((norm_surface(a), eid))
    return sorted(set(out))


def gazetteer_rows() -> list[tuple[str, str, str]]:
    """(surface, coarse, fine) for every alias incl. NIL-only entities —
    the mention tagger's lexicon (T2/T3)."""
    out = []
    for _eid, _name, coarse, fine, _pop, aliases in KB_ENTITIES:
        for a in aliases:
            out.append((a, coarse, fine))
    return sorted(set(out))
