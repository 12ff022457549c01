"""Distributed BPE (byte-pair-encoding) merge training — the
tokenizer-fitting step of an LLM data pipeline, exact and engine-
independent.

Training a BPE vocabulary over a 100 TB corpus is a canonical
pretraining job (Sennrich et al. 2016; GPT-2's tokenizer): count
words, represent each distinct word as a symbol sequence, then
repeatedly merge the globally most frequent adjacent symbol pair.
The merge loop is inherently sequential, but each round is a tiny
distributed job over the DISTINCT-WORD table, not the corpus — the
classic "word-count once, iterate on the vocabulary" shape.

Symbol-sequence encoding (the whole trick): a word's segmentation is
a single string — symbols joined by TWO spaces with one sentinel
space at each end, e.g. ``" h  e  l  l  o "``.  Merging pair (a, b)
into ``ab`` is then ONE literal ``replace(seq, ' a  b ', ' ab ')``:
the pattern consumes one sentinel space from each side and the
replacement restores it, so back-to-back matches keep matching
(`` x  a  b  a  b  x `` → `` x  ab  ab  x ``), and leftmost
non-overlapping replace semantics — identical in Spark and DuckDB,
verified by test — are exactly BPE's greedy left-to-right merge
order (`` a  a  a `` → `` aa  a ``).  No Python touches a row:
training is pure whole-stage-codegen string ops.

Scale shape (the 100 TB path):
- ONE corpus-scale shuffle total: the word-count aggregation
  (map-side combined; keys are words, text never moves).
- Each merge round runs on the distinct-word table (vocabulary
  scale): one map-side-combined pair-count exchange of at most
  |vocab|·avg_len rows, then a single-row ``collect`` of the winning
  pair (bounded: 1 row × merges).  The vocab frame is
  localCheckpoint-ed per round so round k never replays rounds 1..k-1.
- Applying the learned merges back to documents is a BROADCAST join
  of the per-word segmentation (vocabulary-sized) against the
  exploded doc→word spine — corpus rows shuffle once on doc_id for
  the per-doc aggregate and carry only (doc_id, word), never text.

Determinism contract: integer counts, lexicographic ``(count DESC,
left ASC, right ASC)`` tie-break, and the replace() encoding above —
the DuckDB twin (``sql_bpe_merges`` / ``sql_bpe_token_stats``,
unrolled one CTE block per round, the PageRank-oracle pattern of
operators/graph.py) hash-matches bit-for-bit.

Reference parity: GAIA's text pipeline consumes a fixed external
tokenizer (SURVEY.md §2.2 T1/T12); a Spark-first engine at corpus
scale must also be able to FIT one — this kernel is that producer,
beyond-reference scope like the WARC source (sources/warc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: word characters — [a-z]+ runs of the lowercased text; everything
#: else is a separator (cross-engine-exact regex subset, the
#: text_analysis.py convention).
_WORD_SPLIT = "[^a-z]+"

_MERGE_SCHEMA = T.StructType([
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("lhs", T.StringType(), False),
    T.StructField("rhs", T.StringType(), False),
    T.StructField("merged", T.StringType(), False),
    T.StructField("pair_cnt", T.LongType(), False),
])


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, cnt): the single corpus-scale shuffle."""
    w = F.explode(
        F.split(F.lower(F.col(text_col)), _WORD_SPLIT)
    ).alias("word")
    return (
        docs.select(w)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _initial_seq() -> F.Column:
    """word → ' c1  c2  …  cn ' (double-space joined, sentinel-padded)."""
    return F.concat(
        F.lit(" "),
        F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1  ")),
        F.lit(" "),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(word, cnt, seq) → (l, r, pcnt): adjacent-pair counts weighted
    by word frequency.  Map-side combined; vocabulary scale."""
    toks = F.split(F.trim(F.col("seq")), "  ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("l"),
            F.element_at(toks, i + 1).alias("r"),
        ),
    )
    return (
        vocab.where(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("pcnt"))
    )


def _train(docs: DataFrame, merges: int, text_col: str):
    """→ (merge rows, final vocab frame (word, cnt, seq))."""
    vocab = (
        _word_counts(docs, text_col)
        .withColumn("seq", _initial_seq())
        .localCheckpoint()
    )
    out: list[tuple] = []
    for rank in range(1, merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("pcnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, pcnt = top[0]["l"], top[0]["r"], int(top[0]["pcnt"])
        out.append((rank, l, r, l + r, pcnt))
        vocab = vocab.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f" {l}  {r} "),
                F.lit(f" {l}{r} "),
            ),
        ).localCheckpoint()
    return out, vocab


def bpe_train(docs: DataFrame, merges: int = 6,
              text_col: str = "text") -> DataFrame:
    """→ (rank, lhs, rhs, merged, pair_cnt): the learned merge table,
    one row per round, in merge order."""
    rows, _ = _train(docs, merges, text_col)
    return docs.sparkSession.createDataFrame(rows, _MERGE_SCHEMA)


def bpe_token_stats(docs: DataFrame, merges: int = 6,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_words, n_bpe_tokens): per-document token counts
    under the corpus-fitted BPE vocabulary (docs with ≥1 word).

    The per-word segmentation (vocabulary-sized) broadcasts onto the
    exploded doc→word spine; document text never joins or shuffles.
    """
    _, vocab = _train(docs, merges, text_col)
    toks = F.split(F.trim(F.col("seq")), "  ")
    word_tok = vocab.select(
        "word", F.size(toks).cast("long").alias("n_tok"))
    doc_words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), _WORD_SPLIT)
            ).alias("word"),
        )
        .where(F.col("word") != "")
    )
    return (
        doc_words.join(F.broadcast(word_tok), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
        )
    )


# --------------------------------------------------------------------
# DuckDB twins — one CTE block per merge round, unrolled.
# --------------------------------------------------------------------

def _sql_rounds(rel: str, merges: int, text_col: str) -> str:
    """Shared CTE chain: words → seq0 → (pairs_k, top_k, seq_k)*."""
    parts = [f"""
words AS (
  SELECT w AS word, count(*)::BIGINT AS cnt
  FROM (SELECT unnest(string_split_regex(lower({text_col}),
                                         '{_WORD_SPLIT}')) AS w
        FROM {rel})
  WHERE w <> ''
  GROUP BY w
),
seq_0 AS (
  SELECT word, cnt,
         ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' '
           AS seq
  FROM words
)"""]
    for k in range(1, merges + 1):
        parts.append(f"""
pairs_{k} AS (
  SELECT toks[i] AS l, toks[i + 1] AS r, sum(cnt)::BIGINT AS pcnt
  FROM (SELECT cnt, toks, unnest(range(1, len(toks))) AS i
        FROM (SELECT cnt, string_split(trim(seq), '  ') AS toks
              FROM seq_{k - 1})
        WHERE len(toks) >= 2)
  GROUP BY 1, 2
),
top_{k} AS (
  SELECT {k} AS rank, l, r, pcnt
  FROM pairs_{k}
  ORDER BY pcnt DESC, l ASC, r ASC
  LIMIT 1
),
seq_{k} AS (
  SELECT v.word, v.cnt,
         replace(v.seq, ' ' || t.l || '  ' || t.r || ' ',
                        ' ' || t.l || t.r || ' ') AS seq
  FROM seq_{k - 1} v, top_{k} t
)""")
    return "WITH " + ",".join(parts)


def sql_bpe_merges(rel: str, merges: int = 6,
                   text_col: str = "text") -> str:
    """DuckDB twin of :func:`bpe_train`."""
    union = "\nUNION ALL\n".join(
        f"SELECT rank, l AS lhs, r AS rhs, l || r AS merged,"
        f" pcnt AS pair_cnt FROM top_{k}"
        for k in range(1, merges + 1)
    )
    return (f"{_sql_rounds(rel, merges, text_col)}\n"
            f"SELECT rank::INT AS rank, lhs, rhs, merged, pair_cnt"
            f" FROM ({union}) ORDER BY rank")


def sql_bpe_token_stats(rel: str, merges: int = 6,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`bpe_token_stats`."""
    return f"""{_sql_rounds(rel, merges, text_col)},
word_tok AS (
  SELECT word, len(string_split(trim(seq), '  '))::BIGINT AS n_tok
  FROM seq_{merges}
),
doc_words AS (
  SELECT {id_col} AS doc_id, w AS word
  FROM (SELECT {id_col},
               unnest(string_split_regex(lower({text_col}),
                                         '{_WORD_SPLIT}')) AS w
        FROM {rel})
  WHERE w <> ''
)
SELECT d.doc_id,
       count(*)::BIGINT AS n_words,
       sum(t.n_tok)::BIGINT AS n_bpe_tokens
FROM doc_words d JOIN word_tok t USING (word)
GROUP BY d.doc_id"""
