"""S12 AIF ttl sink: round-trip fidelity + cleanKB-style validation."""

import pytest
from pyspark.sql import functions as F

from gaia_spark.sources import aif

TRIPLE_SCHEMA = ("url string, sent_id int, subj string, pred string, "
                 "obj string, subj_type string, obj_type string, conf int")

ROWS = [
    ("http://a.example/x", 0, "barack_obama", "rel:member_of",
     "us_senate", "per_politician", "org_government", 80),
    ("http://a.example/x", 2, "barack_obama", "evt:meet",
     "angela_merkel", "per_politician", "per_politician", 70),
    ("http://b.example/y", 1, "acme_corp", "rel:located_in",
     "springfield", "org_company", "loc_city", 90),
    # adversarial strings: quotes + backslash in entity, colon in pred
    ("http://b.example/y", 3, 'weird "quoted" ent', "rel:odd",
     "back\\slash", "per", "per", 55),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(ROWS, TRIPLE_SCHEMA)


@pytest.fixture(scope="module")
def ttl_dir(spark, triples, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("kb_ttl") / "ttl")
    aif.write_ttl(triples, d)
    return d


def test_roundtrip_exact_triple_set(spark, triples, ttl_dir):
    nodes = aif.read_ttl_nodes(spark, ttl_dir)
    back = aif.ttl_to_triples(nodes)
    got = {tuple(r) for r in back.collect()}
    want = {(u, s, su, p, o, c)
            for (u, s, su, p, o, _st, _ot, c) in ROWS}
    assert got == want


def test_entity_nodes_cover_all_entities(spark, ttl_dir):
    nodes = aif.read_ttl_nodes(spark, ttl_dir)
    names = {r.name for r in
             nodes.filter(F.col("kind") == "aida:Entity").collect()}
    want = {su for (_u, _s, su, _p, _o, _st, _ot, _c) in ROWS} | \
           {o for (_u, _s, _su, _p, o, _st, _ot, _c) in ROWS}
    assert names == want


def test_validator_clean_on_emitted_kb(spark, triples, ttl_dir):
    nodes = aif.read_ttl_nodes(spark, ttl_dir)
    pages = triples.select("url")
    assert aif.validate_ttl(nodes, pages).count() == 0


def test_validator_flags_corruption(spark, triples, ttl_dir):
    nodes = aif.read_ttl_nodes(spark, ttl_dir)
    # drop one entity node → dangling subject/object references
    broken = nodes.filter(
        ~((F.col("kind") == "aida:Entity")
          & (F.col("name") == "barack_obama")))
    checks = {r.check for r in aif.validate_ttl(broken).collect()}
    assert "dangling-subject" in checks
    # orphan provenance: pages table missing one url
    pages = triples.filter(F.col("url") != "http://b.example/y") \
                   .select("url")
    checks2 = {r.check for r in aif.validate_ttl(nodes, pages).collect()}
    assert checks2 == {"orphan-provenance"}
