"""Distributed BPE trainer (functions/bpe.py).

Pins: (1) the double-space replace() encoding implements greedy
left-to-right BPE merging identically in Spark and DuckDB, (2) the
merge table and per-doc token stats hash-match the unrolled-CTE
DuckDB twin, (3) the trainer agrees with an independent pure-Python
reference BPE on an adversarial corpus, (4) partitioning invariance.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from gaia_spark.functions import bpe


def _py_bpe(word_counts: dict[str, int], merges: int):
    """Independent reference: textbook greedy BPE on (word → count)."""
    vocab = {w: list(w) for w in word_counts}
    out = []
    for rank in range(1, merges + 1):
        pairs: dict[tuple, int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + c)
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, l, r, l + r, cnt))
        for w, syms in vocab.items():
            i, ns = 0, []
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == l and syms[i + 1] == r):
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            vocab[w] = ns
    return out, {w: len(s) for w, s in vocab.items()}


@pytest.fixture(scope="module")
def docs(spark):
    # adversarial: runs of a repeated char (overlap semantics), words
    # that are prefixes of each other, back-to-back mergeable pairs,
    # punctuation separators, and a tie in pair counts.
    rows = [
        (0, "aaaa aaaa aa the the the then there"),
        (1, "banana bandana ban band banana!"),
        (2, "abab abab ab cdcd; cd cdcd"),
        (3, "low lower lowest low low newer new news"),
        (4, "zz zz zz yy yy xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_pure_python_reference(spark, docs):
    import re
    from collections import Counter

    wc = Counter(
        w for (_, t) in docs.collect()
        for w in re.split("[^a-z]+", t.lower()) if w)
    ref_merges, ref_tok = _py_bpe(dict(wc), merges=8)

    got = [tuple(r) for r in bpe.bpe_train(docs, merges=8)
           .orderBy("rank").collect()]
    assert got == ref_merges

    stats = {r.doc_id: r.n_bpe_tokens
             for r in bpe.bpe_token_stats(docs, merges=8).collect()}
    expect = {}
    for d, t in [(r.doc_id, r.text) for r in docs.collect()]:
        ws = [w for w in re.split("[^a-z]+", t.lower()) if w]
        expect[d] = sum(ref_tok[w] for w in ws)
    assert stats == expect


def test_matches_duckdb_twin(spark, docs):
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)

    oracle = con.execute(bpe.sql_bpe_merges("documents", 6)).fetchall()
    got = [tuple(r) for r in
           bpe.bpe_train(docs, merges=6).orderBy("rank").collect()]
    assert got == [tuple(r) for r in oracle]

    oracle2 = sorted(
        con.execute(bpe.sql_bpe_token_stats("documents", 6)).fetchall())
    got2 = sorted(
        tuple(r) for r in bpe.bpe_token_stats(docs, merges=6).collect())
    assert got2 == [tuple(r) for r in oracle2]


def test_partitioning_invariance(spark, docs):
    one = [tuple(r) for r in bpe.bpe_train(
        docs.coalesce(1), merges=5).orderBy("rank").collect()]
    many = [tuple(r) for r in bpe.bpe_train(
        docs.repartition(7), merges=5).orderBy("rank").collect()]
    assert one == many


def test_merge_encoding_edge_cases(spark):
    """Back-to-back pairs and overlapping runs merge exactly like
    greedy left-to-right BPE (the replace() encoding contract)."""
    docs = spark.createDataFrame(
        [(0, "aaa " * 10 + "abab " * 5)], "doc_id long, text string")
    merges, vocab = bpe._train(docs, merges=2, text_col="text")
    seqs = {r.word: r.seq for r in vocab.collect()}
    # round 1 merges (a,a): 'aaa' -> [aa, a]; round 2 depends on counts
    assert merges[0][1:3] == ("a", "a")
    assert seqs["aaa"].startswith(" aa ") or " aa " in seqs["aaa"]
    # sentinel/double-space invariant is preserved after merging
    for s in seqs.values():
        assert s.startswith(" ") and s.endswith(" ")
        assert "   " not in s
