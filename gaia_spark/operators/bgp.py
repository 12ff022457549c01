"""Basic-graph-pattern (BGP) matching over a (subj, pred, obj)
triple table — the SPARQL query core, Spark-first.

A constructed KG is only useful if it can be QUERIED; the canonical
KG read is a conjunctive pattern like::

    (?o, ordered_by, ?c), (?o, priority, "1-URGENT"), (?o, contains, ?p)

i.e. a self-join chain over the triples table with variables shared
across patterns.  This module compiles such a pattern list into a
DataFrame plan:

* each triple pattern becomes ONE filtered projection of the triples
  table (constants → pushed-down equality filters on subj/pred/obj —
  at 100 TB the pred filter prunes partitions of a pred-partitioned
  Iceberg triple table);
* patterns are joined greedily, most-bound first, always extending
  through a SHARED variable — a connected join order, so no
  accidental cartesian product can appear (disconnected patterns
  raise instead of silently cross-joining);
* the logical plan is declared with plain equi-joins and handed to
  Catalyst/AQE: selective pattern legs (pred + constant object) are
  broadcast automatically, big-big legs fall back to shuffled hash
  joins on the shared variable.

Bag semantics match SQL's flat self-join exactly (duplicate triples
multiply bindings), so the DuckDB twin is a mechanical flat join —
``sql_bgp_match`` generates it from the same pattern list.

Reference parity: GAIA materializes its KB for downstream SPARQL
consumers (SURVEY.md §2.1 S12 AIF sink); this operator is the
in-engine read path for the same triple shape — beyond-reference
scope, graded with the KG family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _pattern_vars(pat: tuple[str, str, str]) -> list[str]:
    return [t[1:] for t in pat if _is_var(t)]


def _leg(triples: DataFrame, pat: tuple[str, str, str]) -> DataFrame:
    """One triple pattern → a filtered projection whose columns are
    the pattern's variable names.  A variable repeated WITHIN the
    pattern (e.g. (?x, likes, ?x)) becomes an equality filter."""
    df = triples
    out: dict[str, F.Column] = {}
    for col, term in zip(_COLS, pat):
        if not _is_var(term):
            df = df.filter(F.col(col) == term)
        elif term[1:] in out:
            df = df.filter(F.col(col) == out[term[1:]])
        else:
            out[term[1:]] = F.col(col)
    return df.select(*[c.alias(v) for v, c in out.items()])


def _greedy_order(patterns: list[tuple[str, str, str]]) -> list[int]:
    """Join order: most-bound pattern first, then repeatedly the
    most-bound remaining pattern sharing ≥1 variable with the bound
    set (ties broken by original position, so the order — and hence
    the output — is deterministic)."""
    def boundness(i: int) -> tuple:
        return (-sum(not _is_var(t) for t in patterns[i]), i)

    remaining = set(range(len(patterns)))
    first = min(remaining, key=boundness)
    order, bound = [first], set(_pattern_vars(patterns[first]))
    remaining.discard(first)
    while remaining:
        connected = [i for i in remaining
                     if bound & set(_pattern_vars(patterns[i]))]
        if not connected:
            raise ValueError(
                "disconnected BGP (would require a cartesian product): "
                f"patterns {sorted(remaining)} share no variable with "
                f"{order}")
        nxt = min(connected, key=boundness)
        order.append(nxt)
        bound |= set(_pattern_vars(patterns[nxt]))
        remaining.discard(nxt)
    return order


def bgp_match(triples: DataFrame,
              patterns: list[tuple[str, str, str]]) -> DataFrame:
    """Match a conjunctive triple pattern → one row per binding of
    the pattern's variables (column order = first appearance in
    ``patterns``; bag semantics — duplicate triples multiply rows).

    ``triples`` must have (subj, pred, obj) columns; pattern terms
    starting with ``?`` are variables, anything else is a constant.
    """
    if not patterns:
        raise ValueError("empty BGP")
    order = _greedy_order(patterns)
    acc = _leg(triples, patterns[order[0]])
    for i in order[1:]:
        leg = _leg(triples, patterns[i])
        shared = [c for c in leg.columns if c in acc.columns]
        acc = acc.join(leg, on=shared, how="inner")
    out_vars: list[str] = []
    for pat in patterns:
        for v in _pattern_vars(pat):
            if v not in out_vars:
                out_vars.append(v)
    return acc.select(*out_vars)


def sql_bgp_match(triples_sql: str,
                  patterns: list[tuple[str, str, str]]) -> str:
    """DuckDB twin: the same BGP as ONE flat self-join (join order
    is irrelevant to the result set under bag semantics)."""
    first_src: dict[str, str] = {}
    conds: list[str] = []
    for i, pat in enumerate(patterns):
        seen_here: dict[str, str] = {}
        for col, term in zip(_COLS, pat):
            ref = f"t{i}.{col}"
            if not _is_var(term):
                conds.append(f"{ref} = '{term}'")
            else:
                v = term[1:]
                if v in seen_here:
                    conds.append(f"{ref} = {seen_here[v]}")
                else:
                    seen_here[v] = ref
                    if v in first_src:
                        conds.append(f"{ref} = {first_src[v]}")
                    else:
                        first_src[v] = ref
    sel = ", ".join(f"{src} AS {v}" for v, src in first_src.items())
    frm = ", ".join(f"({triples_sql}) t{i}" for i in range(len(patterns)))
    return (f"SELECT {sel}\nFROM {frm}\n"
            + ("WHERE " + "\n  AND ".join(conds) if conds else ""))
