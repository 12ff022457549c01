"""Kneser-Ney bigram trainer (functions/lm.py) and positional phrase
match (functions/retrieval.py): hand-computable fixtures pin the
exact fixed-point recipe and the adjacency/overlap semantics.
"""

from pyspark.sql import functions as F

from gaia_spark.functions.lm import KN_PPM, kn_bigram_model
from gaia_spark.functions.retrieval import (phrase_match,
                                            positional_postings)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")


def test_kn_hand_computed(spark):
    """Corpus 'a b, a b, a c': bigram types ab(2), ac(1); the whole
    model is hand-checkable.

    c(ab)=2 c(ac)=1 c1(a)=3 N1+(a·)=2 N1+(·b)=1 N1+(·c)=1 B=2
    p_cont(b) = p_cont(c) = 1e6*1//2 = 500000
    p_kn(ab) = (1e6*(200-75))//300 + (75*2*500000)//300
             = 416666 + 250000 = 666666
    p_kn(ac) = (1e6*25)//300 + 250000 = 83333 + 250000 = 333333
    (min_count=1 keeps both rows)
    """
    m = {(r.w1, r.w2): (r.c12, r.p_kn_ppm)
         for r in kn_bigram_model(
             _docs(spark, ["a b", "a b", "a c"]),
             min_count=1).collect()}
    assert m == {("a", "b"): (2, 666666), ("a", "c"): (1, 333333)}


def test_kn_probability_mass_bounded(spark):
    """Per context w1, Σ_w2 p_kn ≤ 1 (floor division only loses
    mass, never invents it) — checked over a mixed corpus."""
    model = kn_bigram_model(
        _docs(spark, ["x y z x y", "y x z z y", "z z x y x"]),
        min_count=1)
    sums = (model.groupBy("w1").agg(F.sum("p_kn_ppm").alias("s"))
            .collect())
    assert sums and all(r.s <= KN_PPM for r in sums)


def test_kn_min_count_prunes_rows_not_counts(spark):
    """min_count=2 must drop the ac row but leave ab's probability
    unchanged (the marginals still see the pruned bigram)."""
    docs = _docs(spark, ["a b", "a b", "a c"])
    m1 = {(r.w1, r.w2): r.p_kn_ppm
          for r in kn_bigram_model(docs, min_count=1).collect()}
    m2 = {(r.w1, r.w2): r.p_kn_ppm
          for r in kn_bigram_model(docs, min_count=2).collect()}
    assert set(m2) == {("a", "b")}
    assert m2[("a", "b")] == m1[("a", "b")]


def test_postings_only_query_terms_leave_row(spark):
    got = positional_postings(
        _docs(spark, ["the cat sat on the mat"]), ["the", "mat"]
    ).collect()
    assert {(r.tok, r.pos) for r in got} == {("the", 1), ("the", 5),
                                             ("mat", 6)}


def test_phrase_counts_and_overlaps(spark):
    """'a a a' contains 'a a' twice (overlap counted); doc without
    adjacency is absent."""
    got = {r.doc_id: r.n_occurrences
           for r in phrase_match(
               _docs(spark, ["a a a", "a b a b", "b b"]),
               ["a", "a"]).collect()}
    assert got == {0: 2}


def test_phrase_three_terms(spark):
    got = {r.doc_id: r.n_occurrences
           for r in phrase_match(
               _docs(spark, ["x y z", "x y y z", "y z x y z"]),
               ["x", "y", "z"]).collect()}
    assert got == {0: 1, 2: 1}


def test_phrase_punctuation_and_case_fold(spark):
    """Tokenizer folds case and splits on punctuation — 'Table. Hash'
    is an adjacent pair."""
    got = {r.doc_id: r.n_occurrences
           for r in phrase_match(
               _docs(spark, ["Table. Hash!"]),
               ["table", "hash"]).collect()}
    assert got == {0: 1}


def test_collocations_hand_computed(spark):
    """Corpus 'a b a b c': unigrams a:2 b:2 c:1, Nu=5; bigrams
    ab:2 ba:1 bc:1, Nb=4.  lift(ab) = (100·((2·5)//2)·5)//(4·2)
    = (100·5·5)//8 = 312."""
    from gaia_spark.functions.text_analysis import collocations

    got = {(r.w1, r.w2): r for r in collocations(
        _docs(spark, ["a b a b c"]), min_count=1).collect()}
    r = got[("a", "b")]
    assert (r.c12, r.c1, r.c2, r.lift_x100) == (2, 2, 2, 312)
    assert got[("b", "c")].lift_x100 == (100 * ((1 * 5) // 2) * 5) \
        // (4 * 1)


def test_collocations_min_count_prunes(spark):
    from gaia_spark.functions.text_analysis import collocations

    out = collocations(_docs(spark, ["x y z", "x y w"]),
                       min_count=2).collect()
    assert {(r.w1, r.w2) for r in out} == {("x", "y")}
