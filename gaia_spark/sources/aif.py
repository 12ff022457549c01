"""S12 — AIF (AIDA Interchange Format) RDF/Turtle sink + parser + validator.

The reference's final KB serialization (`<output_dir>/kb/ttl`,
/root/reference/README.md:50-51) and its JVM `cleanKB` validation pass
(README.md:203-223).  Emission follows the AIF reification shape:

- one ``aida:Entity`` node per canonical entity, carrying
  ``aida:hasName`` (the original surface, so parsing is lossless) and
  a ``gaia:fineType`` edge;
- one reified ``rdf:Statement`` per canonical triple
  (rdf:subject/predicate/object + ``gaia:predLabel`` literal +
  ``aida:confidence``), justified by
- one ``aida:TextJustification`` node per statement with the source
  url + sentence index — the provenance cleanKB checks.

Everything is generated with pure column expressions (one distributed
pass, no Python in the emit path); statement ids are md5 of the full
triple key, so emission is deterministic and re-runnable.  The parser
is the exact inverse (line-grouping mapInPandas + two relational
joins), giving a ttl → triples round-trip that must reproduce the
input set byte-for-byte — the S12 fidelity test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PREFIX = (
    "@prefix aida: <https://tac.nist.gov/tracks/SM-KBP/2019/"
    "ontologies/InterchangeOntology#> .\n"
    "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
    "@prefix gaia: <https://gaia.example/kg#> ."
)


def _uri(col):
    """IRI-safe local name: percent-critical chars replaced."""
    return F.regexp_replace(
        F.regexp_replace(col, r"[:\s]", "_"), r"[<>\"{}|^`\\]", "")


def _lit(col):
    """Escaped double-quoted turtle literal."""
    return F.concat(
        F.lit('"'),
        F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"),
                         r"\"", r"\\\""),
        F.lit('"'),
    )


def _stmt_id(triples: DataFrame):
    return F.md5(F.concat_ws(
        "#", "url", F.col("sent_id").cast("string"),
        "subj", "pred", "obj"))


def entity_blocks(triples: DataFrame) -> DataFrame:
    """One aida:Entity block per distinct (entity, fine type)."""
    ents = (
        triples.select(F.col("subj").alias("ent"),
                       F.col("subj_type").alias("fine"))
        .unionByName(triples.select(F.col("obj").alias("ent"),
                                    F.col("obj_type").alias("fine")))
        .groupBy("ent")
        .agg(F.min("fine").alias("fine"))
    )
    return ents.select(
        F.concat(
            F.lit("gaia:ent_"), _uri(F.col("ent")),
            F.lit(" a aida:Entity ;\n  aida:hasName "),
            _lit(F.col("ent")),
            F.lit(" ;\n  gaia:fineType gaia:type_"), _uri(F.col("fine")),
            F.lit(" ."),
        ).alias("stmt")
    )


def statement_blocks(triples: DataFrame) -> DataFrame:
    """Reified rdf:Statement + its aida:TextJustification node."""
    sid = _stmt_id(triples)
    stmt = F.concat(
        F.lit("gaia:assert_"), sid,
        F.lit(" a rdf:Statement ;\n  rdf:subject gaia:ent_"),
        _uri(F.col("subj")),
        F.lit(" ;\n  rdf:predicate gaia:pred_"), _uri(F.col("pred")),
        F.lit(" ;\n  rdf:object gaia:ent_"), _uri(F.col("obj")),
        F.lit(" ;\n  gaia:predLabel "), _lit(F.col("pred")),
        F.lit(" ;\n  aida:confidence "), F.col("conf").cast("string"),
        F.lit(" ;\n  aida:justifiedBy gaia:just_"), sid,
        F.lit(" ."),
    )
    just = F.concat(
        F.lit("gaia:just_"), sid,
        F.lit(" a aida:TextJustification ;\n  aida:source "),
        _lit(F.col("url")),
        F.lit(" ;\n  aida:sentenceIndex "),
        F.col("sent_id").cast("string"),
        F.lit(" ."),
    )
    return (
        triples.select(stmt.alias("stmt"))
        .unionByName(triples.select(just.alias("stmt")))
    )


def kb_to_ttl(triples: DataFrame) -> DataFrame:
    """→ one-column DataFrame of ttl blocks (prefixes + entities +
    reified statements + justifications)."""
    spark = triples.sparkSession
    prefixes = spark.createDataFrame([(_PREFIX,)], "stmt string")
    return (
        prefixes
        .unionByName(entity_blocks(triples))
        .unionByName(statement_blocks(triples))
    )


def write_ttl(triples: DataFrame, path: str) -> None:
    kb_to_ttl(triples).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# parser (exact inverse) + validator (cleanKB analog)
# ---------------------------------------------------------------------------

_NODE_SCHEMA = ("uri string, kind string, name string, pred_label string, "
                "subj_uri string, obj_uri string, conf int, just_uri string, "
                "source string, sent_id int")


def _parse_blocks(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """wholetext file rows → one parsed row per ttl node block."""
    import re

    def unescape(s: str) -> str:
        return s.replace('\\"', '"').replace("\\\\", "\\")

    for pdf in it:
        out = []
        for content in pdf["value"]:
            block: list[str] = []
            for line in content.split("\n") + [""]:
                starts_new = not line.startswith("  ")
                if starts_new and block:
                    text = "\n".join(block)
                    m = re.match(r"(gaia:\S+) a (\S+)", text)
                    if m:
                        uri, kind = m.group(1), m.group(2)
                        g = lambda p: (re.search(p, text) or [None, None])[1]
                        conf = g(r"aida:confidence (\d+)")
                        sent = g(r"aida:sentenceIndex (\d+)")
                        out.append({
                            "uri": uri, "kind": kind,
                            "name": (lambda v: unescape(v) if v else None)(
                                g(r'aida:hasName "((?:[^"\\]|\\.)*)"')),
                            "pred_label": (lambda v: unescape(v) if v else
                                           None)(
                                g(r'gaia:predLabel "((?:[^"\\]|\\.)*)"')),
                            "subj_uri": g(r"rdf:subject (\S+) ;"),
                            "obj_uri": g(r"rdf:object (\S+) ;"),
                            "conf": int(conf) if conf else None,
                            "just_uri": g(r"aida:justifiedBy (\S+) \."),
                            "source": (lambda v: unescape(v) if v else None)(
                                g(r'aida:source "((?:[^"\\]|\\.)*)"')),
                            "sent_id": int(sent) if sent else None,
                        })
                    block = []
                if line.strip():
                    block.append(line)
        yield pd.DataFrame(
            out, columns=[c.split(" ")[0]
                          for c in _NODE_SCHEMA.split(", ")])


def read_ttl_nodes(spark: SparkSession, path: str) -> DataFrame:
    """ttl directory → typed node table (entities, statements,
    justifications), one Arrow pass per file."""
    raw = spark.read.text(path, wholetext=True)
    return raw.mapInPandas(_parse_blocks, _NODE_SCHEMA)


def ttl_to_triples(nodes: DataFrame) -> DataFrame:
    """Invert the reified shape back to
    (url, sent_id, subj, pred, obj, conf) with original strings.

    Two joins: entity names onto subject/object uris, justification
    provenance onto the statement's just_uri.
    """
    ents = nodes.filter(F.col("kind") == "aida:Entity").select(
        F.col("uri").alias("ent_uri"), F.col("name"))
    stmts = nodes.filter(F.col("kind") == "rdf:Statement").select(
        "subj_uri", "obj_uri", "pred_label", "conf", "just_uri")
    justs = nodes.filter(F.col("kind") == "aida:TextJustification").select(
        F.col("uri").alias("just_uri"),
        F.col("source").alias("url"), "sent_id")
    return (
        stmts.join(ents.select(F.col("ent_uri").alias("subj_uri"),
                               F.col("name").alias("subj")), "subj_uri")
        .join(ents.select(F.col("ent_uri").alias("obj_uri"),
                          F.col("name").alias("obj")), "obj_uri")
        .join(justs, "just_uri")
        .select("url", "sent_id", "subj",
                F.col("pred_label").alias("pred"), "obj", "conf")
    )


def validate_ttl(nodes: DataFrame,
                 pages: DataFrame | None = None) -> DataFrame:
    """cleanKB analog over emitted ttl → (check, uri) violation rows.

    - dangling-subject/object: statement references no entity node
    - dangling-justification: statement's just_uri has no node
    - conf-range: confidence outside [0, 100]
    - orphan-provenance: justification source not in pages(url)
      (the cleanKB left-semi check, README.md:205) — only when
      ``pages`` is given.
    """
    ents = nodes.filter(F.col("kind") == "aida:Entity").select(
        F.col("uri").alias("ref"))
    stmts = nodes.filter(F.col("kind") == "rdf:Statement")
    justs = nodes.filter(F.col("kind") == "aida:TextJustification")

    def dangling(col: str, refs: DataFrame, check: str) -> DataFrame:
        return (
            stmts.select(F.col(col).alias("ref"), F.col("uri"))
            .join(refs, "ref", "left_anti")
            .select(F.lit(check).alias("check"), "uri")
        )

    out = (
        dangling("subj_uri", ents, "dangling-subject")
        .unionByName(dangling("obj_uri", ents, "dangling-object"))
        .unionByName(dangling("just_uri",
                              justs.select(F.col("uri").alias("ref")),
                              "dangling-justification"))
        .unionByName(
            stmts.filter((F.col("conf") < 0) | (F.col("conf") > 100))
            .select(F.lit("conf-range").alias("check"), "uri"))
    )
    if pages is not None:
        out = out.unionByName(
            justs.join(pages.select(F.col("url").alias("source"))
                       .distinct(), "source", "left_anti")
            .select(F.lit("orphan-provenance").alias("check"), "uri"))
    return out
