"""cdc_chunks (functions/dedup.py) and core_decompose
(operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from gaia_spark.functions.dedup import cdc_chunks
from gaia_spark.operators.graph import core_decompose


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")


def test_cdc_chunks_partition_the_document(spark):
    """Chunks tile the text exactly: contiguous, in order, covering
    every character once."""
    text = ("the quick brown fox jumps over the lazy dog " * 8).strip()
    rows = sorted(cdc_chunks(_docs(spark, [text])).collect(),
                  key=lambda r: r.chunk_idx)
    assert rows[0].start == 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur.start == prev.start + prev.chunk_len
    assert rows[-1].start + rows[-1].chunk_len - 1 == len(text)


def test_cdc_short_doc_single_chunk(spark):
    rows = cdc_chunks(_docs(spark, ["abc"])).collect()
    assert len(rows) == 1
    assert (rows[0].start, rows[0].chunk_len) == (1, 3)


def test_cdc_shift_resistance(spark):
    """Inserting one char at the head preserves every chunk after
    the first boundary (fingerprint multiset intersection is large);
    fixed-size chunking would share ~nothing."""
    base = ("sphinx of black quartz judge my vow 0123456789 " * 12)
    out = cdc_chunks(_docs(spark, [base, "X" + base])).collect()
    fp0 = {r.chunk_md5 for r in out if r.doc_id == 0}
    fp1 = {r.chunk_md5 for r in out if r.doc_id == 1}
    assert len(fp0) > 4
    shared = len(fp0 & fp1)
    assert shared >= len(fp0) - 2  # only the head chunk may differ


def test_cdc_identical_content_identical_fingerprints(spark):
    out = cdc_chunks(_docs(spark, ["same content here " * 10] * 2)
                     ).collect()
    a = sorted(r.chunk_md5 for r in out if r.doc_id == 0)
    b = sorted(r.chunk_md5 for r in out if r.doc_id == 1)
    assert a == b


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_coreness_triangle_with_tail(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                       ("c", "t1"), ("t1", "t2")])
    got = {r.node: r.coreness
           for r in core_decompose(e, k_max=4).collect()}
    assert got == {"a": 2, "b": 2, "c": 2, "t1": 1, "t2": 1}


def test_coreness_k5_clique_capped(spark):
    """K5 has coreness 4 everywhere — exactly the k_max cap, and a
    K6 would ALSO report 4 (cap contract)."""
    n5 = [f"v{i}" for i in range(5)]
    k5 = [(a, b) for i, a in enumerate(n5) for b in n5[i + 1:]]
    got = {r.node: r.coreness
           for r in core_decompose(_edges(spark, k5), k_max=4)
           .collect()}
    assert set(got.values()) == {4}
    n6 = [f"w{i}" for i in range(6)]
    k6 = [(a, b) for i, a in enumerate(n6) for b in n6[i + 1:]]
    got6 = {r.node: r.coreness
            for r in core_decompose(_edges(spark, k6), k_max=4)
            .collect()}
    assert set(got6.values()) == {4}


def test_coreness_raises_on_round_exhaustion(spark):
    """A long chain peels one layer per round at k=2 — rounds=2 must
    raise, not return a partial decomposition."""
    chain = [(f"c{i}", f"c{i+1}") for i in range(12)]
    with pytest.raises(RuntimeError, match="still changing"):
        core_decompose(_edges(spark, chain), k_max=2, rounds=2)
