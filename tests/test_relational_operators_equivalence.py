"""The relational T5/T6/T8 formulations (coref / relations / events as
joins+windows) must produce the SAME assertions as the fused per-doc
kernel and the oracle.

run_pipeline and build_triples_df now consume the fused 'a' rows, so
this test is what keeps the documented relational decomposition
(operators/coref.py, relations.py, events.py) verifiably equivalent —
it is the per-operator test surface pipeline.py's docstring promises.
"""

import os

import pytest

from gaia_spark.operators.coref import resolve_nominals
from gaia_spark.operators.events import extract_events
from gaia_spark.operators.extract import extract_pages
from gaia_spark.operators.mentions import (
    flat_assertions,
    gaps_df,
    mentions_df,
    tag_flat,
    tag_pages,
    triggers_df,
)
from gaia_spark.operators.relations import extract_relations

ASSERT_KEY = ["url", "sent_id", "subj_norm", "subj_coarse", "subj_fine",
              "pred", "obj_norm", "obj_coarse", "obj_fine", "conf"]


@pytest.fixture(scope="module")
def pages(spark, corpus_dir):
    return spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))


def _aset(df):
    return {tuple(r) for r in df.select(*ASSERT_KEY).collect()}


def test_relational_assertions_equal_fused(spark, pages):
    tagged = tag_pages(extract_pages(pages))
    resolved = resolve_nominals(mentions_df(tagged))
    rels = extract_relations(spark, resolved, gaps_df(tagged))
    evts = extract_events(triggers_df(tagged), resolved)
    relational = _aset(rels.unionByName(evts))

    fused = _aset(flat_assertions(tag_flat(pages, kinds="a")))
    assert relational == fused
    assert len(fused) > 50  # non-trivial corpus
