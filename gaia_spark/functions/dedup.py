"""Deduplication operators for web-scale corpora.

Five families, all shuffle-conscious:

- **exact**: md5 fingerprint → groupBy → keeper = min(doc_id).  One
  shuffle on a 32-byte key; at 100 TB the fingerprint groupBy is the
  canonical map-side-combine aggregation.
- **n-gram Jaccard (exact)**: distinct-token-set similarity via an
  inverted-index self-join (token → doc postings).  Quadratic in
  posting-list length, so it is the *verification* kernel, not the
  blocking strategy.
- **MinHash + LSH**: k=128 seeded xxhash64 min-hashes → b bands of r
  rows → band-hash blocking join → exact-Jaccard verification of
  candidates only.  The scale path: shuffle volume is O(docs × b)
  instead of O(docs²).  With b=32, r=4 the probability of missing a
  pair at Jaccard J is (1-J^r)^b — at J=0.85, (1-0.85^4)^32 ≈ 6e-11
  (catch probability 1-(1-J^r)^b) — so LSH + exact-verify equals the
  exhaustive answer in practice, which is why the DuckDB oracle for it
  can be the exhaustive join.
- **SimHash**: 64-bit sign-aggregated token hashes; near-dup =
  Hamming distance ≤ t, blocked by 4×16-bit bands (any pair within
  Hamming ≤ 3 shares at least one exact band by pigeonhole).
- **embedding cosine**: see similarity.py (shared kernel).

MinHash/LSH internals follow SURVEY.md §2.6 ("MinHash/LSH blocking"):
all built-in functions (xxhash64/transform/array_min/posexplode), zero
Python UDFs, zero driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gaia_spark.functions.text_analysis import SCALE, fingerprint_col, sql_fingerprint

# LSH geometry: NUM_PERM = BANDS * ROWS_PER_BAND
NUM_PERM = 128
BANDS = 32
ROWS_PER_BAND = 4
MINHASH_SEED = 0x5EED_CAFE


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_map(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, fingerprint, keeper): keeper = min id per fingerprint.

    Map-side combine on the md5 key makes this one full shuffle of
    (fingerprint, min_id) partials, not of the documents themselves.
    """
    fp = df.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_col(F.col(text_col)).alias("fingerprint"),
    )
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keeper"))
    return fp.join(keep, "fingerprint").select("doc_id", "fingerprint",
                                               "keeper")


def sql_exact_dedup_map(rel: str, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    fp = sql_fingerprint(text_col)
    return f"""
WITH fp AS (
  SELECT {id_col} AS doc_id, {fp} AS fingerprint FROM {rel}
), keep AS (
  SELECT fingerprint, min(doc_id) AS keeper FROM fp GROUP BY fingerprint
)
SELECT fp.doc_id, fp.fingerprint, keep.keeper
FROM fp JOIN keep USING (fingerprint)
"""


# ---------------------------------------------------------------------------
# token sets + exact Jaccard (verification kernel and small-scale oracle)
# ---------------------------------------------------------------------------

def token_set(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, tok) distinct token postings (lowercased words)."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.col(text_col)), r"\s+"))
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def jaccard_pairs(postings: DataFrame, min_x10k: int) -> DataFrame:
    """Exact token-set Jaccard over an inverted-index self-join.

    → (a_id, b_id, jac_x10k) for pairs with floor(1e4·J) ≥ min_x10k.
    Integerized with floor so the value hashes identically cross-engine.
    """
    sizes = postings.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jac_x10k",
            F.floor(
                F.lit(SCALE) * F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter"))
            ),
        )
        .filter(F.col("jac_x10k") >= min_x10k)
        .select("a_id", "b_id", "jac_x10k")
    )


def sql_jaccard_pairs(rel: str, min_x10k: int, text_col: str = "text",
                      id_col: str = "doc_id", where: str = "TRUE") -> str:
    return f"""
WITH postings AS (
  SELECT DISTINCT {id_col} AS doc_id, tok
  FROM (
    SELECT {id_col}, unnest(string_split_regex(lower({text_col}), '\\s+'))
           AS tok
    FROM {rel} WHERE {where}
  ) WHERE tok <> ''
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM postings GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM postings a JOIN postings b USING (tok)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       floor({SCALE} * inter::DOUBLE / (sa.sz + sb.sz - inter))::BIGINT
         AS jac_x10k
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE floor({SCALE} * inter::DOUBLE / (sa.sz + sb.sz - inter))
      >= {min_x10k}
"""


def containment_pairs(df: DataFrame, min_x10k: int = 8000,
                      max_df: int = 64, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Asymmetric token-set containment ``C(inner ⊂ outer) =
    |A∩B| / |A|`` — the quote-inclusion / aggregator-page detector
    Jaccard misses: a 50-word post fully quoted inside a 5000-word
    roundup scores J ≈ 0.01 but containment 1.0.  Directed output
    ``(inner_id, outer_id, cont_x10k)`` for pairs where the INNER
    document's token set sits ≥ min_x10k/10⁴ inside the OUTER's;
    ``cont_x10k`` is pure integer division (``(10⁴·|A∩B|) div |A|``),
    hash-identical cross-engine with no float anywhere.

    Hub guard (the scale contract, same family as lsh_candidates'
    precollapse and link_prediction's degree cap): tokens with
    document frequency > max_df are dropped from the index BEFORE the
    pair join — a stopword appearing in 10⁷ docs would emit 10¹⁴/2
    candidate rows and carries no containment signal.  Sizes and
    intersections are computed over the SAME surviving vocabulary, so
    the ratio is internally consistent (standard stop-shingle
    removal; documents whose every token is df-capped drop out —
    boilerplate-only docs, by construction the right outcome).

    Scale shape: df count (map-side-combined, key = token), broadcast-
    eligible capped-vocabulary filter, inverted-index self-join keyed
    by token with per-token fan-out ≤ max_df², pair-keyed count, two
    vocabulary-thin size joins.  Text never travels; ids and tokens
    only.
    """
    postings = token_set(df, text_col, id_col)
    dfc = postings.groupBy("tok").agg(F.count("*").alias("tok_df"))
    kept = (postings.join(dfc.filter(F.col("tok_df") <= max_df), "tok")
            .select("doc_id", "tok").localCheckpoint())
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = kept.alias("a")
    b = kept.alias("b")
    inter = (
        a.join(b, "tok")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("inner_id"),
                 F.col("b.doc_id").alias("outer_id"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("inner_id"),
                      F.col("sz").alias("sz_inner"))
    return (
        inter.join(sa, "inner_id")
        .withColumn("cont_x10k",
                    F.expr(f"({SCALE} * inter) div sz_inner"))
        .filter(F.col("cont_x10k") >= min_x10k)
        .select("inner_id", "outer_id", "cont_x10k")
    )


def sql_containment_pairs(rel: str, min_x10k: int = 8000,
                          max_df: int = 64, text_col: str = "text",
                          id_col: str = "doc_id",
                          where: str = "TRUE") -> str:
    """DuckDB twin of :func:`containment_pairs`."""
    return f"""
WITH postings AS (
  SELECT DISTINCT {id_col} AS doc_id, tok
  FROM (
    SELECT {id_col}, unnest(string_split_regex(lower({text_col}), '\\s+'))
           AS tok
    FROM {rel} WHERE {where}
  ) WHERE tok <> ''
), kept AS (
  SELECT p.doc_id, p.tok FROM postings p JOIN (
    SELECT tok, count(*) AS tok_df FROM postings GROUP BY tok
  ) d ON p.tok = d.tok AND d.tok_df <= {max_df}
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS inner_id, b.doc_id AS outer_id,
         count(*) AS inter
  FROM kept a JOIN kept b USING (tok)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT inner_id, outer_id,
       (({SCALE} * inter) // s.sz)::BIGINT AS cont_x10k
FROM inter JOIN sizes s ON s.doc_id = inner_id
WHERE ({SCALE} * inter) // s.sz >= {min_x10k}
"""


def prefix_candidates(postings: DataFrame, min_x10k: int) -> DataFrame:
    """Prefix-filtering candidate pairs for an EXACT Jaccard ≥ t join
    (PPJoin family, Xiao et al. 2008 — the third classic next to the
    exhaustive inverted index and MinHash/LSH, and the only one that
    is both exact AND sub-quadratic on stop-token-heavy corpora).

    Under one global token order (document frequency ASC, token ASC —
    rarest first), a doc with |A| = s keeps only its first
    ``p = s − ⌈t·s⌉ + 1`` tokens as index/probe tokens (⌈t·s⌉
    computed in pure integers: ``(min_x10k·s + 9999) div 10⁴``).
    Completeness: J(A,B) ≥ t ⟹ |A∩B| ≥ ⌈t·|A|⌉ and ≥ ⌈t·|B|⌉, and
    the prefix lemma then forces the two prefixes to share a token —
    so joining on PREFIX postings only loses no qualifying pair.

    Why this scales where the exhaustive join dies: a stopword posted
    by every doc has MAXIMAL df, so it sorts LAST and never enters any
    prefix at realistic t — the d²-row stop-token blowup is eliminated
    by construction rather than capped after the fact (the complement
    of lsh_candidates' MAX_BAND_BUCKET posture; both exist because one
    is exact and one is constant-factor cheaper).

    Shape: one token-keyed df count, one df re-attach join, one
    per-doc window over (df, tok) — doc-keyed, reuses the corpus
    partitioning — then the self-join restricted to prefix postings.
    """
    from pyspark.sql.window import Window

    dfc = postings.groupBy("tok").agg(F.count("*").alias("tok_df"))
    ranked = (
        postings.join(dfc, "tok")
        .withColumn("pos", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("tok_df", "tok")))
    )
    sizes = postings.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pref = (
        ranked.join(sizes, "doc_id")
        .filter(F.col("pos") <= F.col("sz")
                - F.expr(f"({min_x10k} * sz + {SCALE - 1}) div {SCALE}")
                + F.lit(1))
        .select("doc_id", "tok")
        .localCheckpoint()
    )
    a = pref.alias("a")
    b = pref.alias("b")
    return (
        a.join(b, "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def jaccard_pairs_prefix(df: DataFrame, min_x10k: int,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard ≥ t near-dup pairs via prefix filtering +
    per-pair verification — IDENTICAL output to :func:`jaccard_pairs`
    (its DuckDB twin is therefore this operator's oracle too), at
    sub-quadratic cost on corpora where shared frequent tokens make
    the exhaustive token self-join explode.  Verification reuses
    :func:`jaccard_for_pairs` (pair-keyed equi-joins — linear in
    candidates, immune to stop-token fan-out).
    """
    postings = token_set(df, text_col, id_col).localCheckpoint()
    cand = prefix_candidates(postings, min_x10k)
    return jaccard_for_pairs(postings, cand, min_x10k)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(postings: DataFrame,
                      num_perm: int = NUM_PERM) -> DataFrame:
    """→ (doc_id, sig ARRAY<BIGINT>[num_perm]).

    One aggregation: per permutation i, min over tokens of
    xxhash64(tok, seed_i).  Map-side combine keeps the shuffle at
    num_perm longs per doc.
    """
    mins = [
        F.min(F.xxhash64(F.col("tok"), F.lit(MINHASH_SEED + i)))
        .alias(f"h{i}")
        for i in range(num_perm)
    ]
    agg = postings.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"),
    )


#: band buckets larger than this switch from all-pairs expansion to
#: star edges (min id ↔ member).  256 distinct-signature docs agreeing
#: on one band is already a pathological boilerplate cluster; the cap
#: bounds the per-bucket join output at O(bucket) instead of
#: O(bucket²) — the d²-rows-per-band scale killer on duplicate-heavy
#: web corpora.
MAX_BAND_BUCKET = 256


def lsh_candidates(sig: DataFrame, bands: int = BANDS,
                   rows_per_band: int = ROWS_PER_BAND,
                   max_bucket: int = MAX_BAND_BUCKET) -> DataFrame:
    """Band the signatures and self-join on (band_id, band_hash).

    → distinct (a_id, b_id) candidate pairs.  Shuffle key is the band
    hash: uniform by construction for distinct signatures — but d docs
    sharing one band hash still build d²/2 join rows, so buckets above
    ``max_bucket`` emit STAR edges (bucket-min ↔ member, linear)
    instead of all pairs.  Star candidates keep cluster RESOLUTION
    exact up to verification transitivity (CC closes the star;
    callers that need the exhaustive pair list of a mega-cluster get
    it from the exact-dup fan-out in ``minhash_dedup_pairs``, never
    from the band join).  Bucket sizing is one window count over the
    join key itself — no extra shuffle.  ``max_bucket=None`` disables
    the guard (exhaustive candidates at any cost).
    """
    from pyspark.sql.window import Window

    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(
                    F.slice(
                        F.col("sig"),
                        b * rows_per_band + 1,
                        rows_per_band,
                    ),
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    if max_bucket is None:
        small, star = banded, None
    else:
        w = Window.partitionBy("band_id", "band_hash")
        sized = banded.withColumn(
            "n", F.count(F.lit(1)).over(w)
        ).withColumn(
            "bucket_min", F.min("doc_id").over(w)
        ).localCheckpoint()
        small = sized.filter(F.col("n") <= max_bucket).drop(
            "n", "bucket_min")
        star = (
            sized.filter((F.col("n") > max_bucket)
                         & (F.col("doc_id") != F.col("bucket_min")))
            .select(F.col("bucket_min").alias("a_id"),
                    F.col("doc_id").alias("b_id"))
        )
    a, b = small.alias("a"), small.alias("b")
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
        )
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def jaccard_for_pairs(postings: DataFrame, pairs: DataFrame,
                      min_x10k: int) -> DataFrame:
    """Exact token-set Jaccard restricted to an explicit pair list.

    → (a_id, b_id, jac_x10k) for the given (a_id, b_id) pairs with
    floor(1e4·J) ≥ min_x10k.  Intersections are computed by expanding
    each pair with its *a-side* token set (join on a_id) and matching
    on (b_id, tok) — both equi-joins keyed on doc ids, never a
    postings⋈postings join on the raw token.  Work is
    Σ_pairs |tokens(a)|: linear in the candidate-pair count and doc
    length, so a stop token posted by every candidate doc can NOT go
    quadratic the way a tok-keyed self-join does (a 100%-df token over
    10^7 candidate docs would otherwise build ~10^14 join rows).
    Pairs with empty intersection drop out of the inner join — correct
    for any min_x10k ≥ 1.
    """
    sizes = postings.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pa = pairs.select("a_id", "b_id").join(
        postings.select(F.col("doc_id").alias("a_id"), "tok"), "a_id")
    inter = (
        pa.join(postings.select(F.col("doc_id").alias("b_id"), "tok"),
                ["b_id", "tok"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jac_x10k",
            F.floor(
                F.lit(SCALE) * F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter"))
            ),
        )
        .filter(F.col("jac_x10k") >= min_x10k)
        .select("a_id", "b_id", "jac_x10k")
    )


def _exact_collapsed(df: DataFrame, text_col: str, id_col: str,
                     min_x10k: int):
    """Exact-fingerprint precollapse shared by the LSH callers.

    → (members, rep_pairs):

    * ``members`` = (member, rep) for every doc whose normalized text
      has ≥1 token, where rep = min doc id among docs with the SAME
      content fingerprint (identical normalized text ⇒ identical
      token set, since both derive from lower + whitespace split).
    * ``rep_pairs`` = exact-Jaccard-verified near-dup pairs over ONE
      representative per distinct fingerprint.

    Why: a Common-Crawl-style corpus is 30-50% exact duplicates with
    mega-clusters; 10^7 copies of one boilerplate page would collide
    in ALL 32 bands and build ~10^15 band-join rows.  Collapsing to
    distinct fingerprints BEFORE signing means the band join never
    sees a duplicate signature from exact duplication at all — the
    d²-per-bucket risk is left only for distinct-text collisions,
    which `lsh_candidates`' star-edge cap bounds.  Tokenless docs
    (empty after normalization) have no Jaccard value and are
    excluded, matching the exhaustive oracle which emits no postings
    for them.
    """
    fp = df.select(
        F.col(id_col).alias("member"),
        fingerprint_col(F.col(text_col)).alias("fp"),
    )
    reps = fp.groupBy("fp").agg(F.min("member").alias("rep"))
    members = fp.join(reps, "fp").select("member", "rep")
    rep_docs = df.join(
        members.filter(F.col("member") == F.col("rep"))
        .select(F.col("member").alias(id_col)),
        id_col, "left_semi",
    )
    postings = token_set(rep_docs, text_col, id_col)
    rep_pairs = jaccard_for_pairs(
        postings, lsh_candidates(minhash_signature(postings)), min_x10k)
    tokenful = postings.select(F.col("doc_id").alias("rep")).distinct()
    return members.join(tokenful, "rep"), rep_pairs


def minhash_dedup_pairs(df: DataFrame, min_x10k: int,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        precollapse: bool = True) -> DataFrame:
    """LSH-blocked near-dup pairs, exact-Jaccard verified.

    Equals the exhaustive `jaccard_pairs` answer w.p. ≈ 1 - 6e-11 per
    true pair at J≥0.85 (see module docstring) while shuffling
    O(n·bands) instead of O(n²) — the 100 TB path.

    Verification runs per candidate *pair* (jaccard_for_pairs), not by
    restricting postings to candidate docs and re-running the tok-keyed
    self-join: the latter still posts every stop token of every
    candidate doc, and one common token across c candidate docs builds
    c²/2 join rows.

    With ``precollapse`` (the default), exact duplicates are collapsed
    to one representative per content fingerprint before signing — the
    band join is over distinct texts only — and the answer is fanned
    back out afterwards: intra-fingerprint pairs carry J=1.0 exactly,
    cross-fingerprint pairs inherit the rep pair's J (identical token
    sets).  The fan-out is output-bound (you cannot emit fewer rows
    than the answer), so the quadratic cost moves from the shuffle to
    the result itself; resolution callers that don't need the pair
    list use `dedup_resolution`, which skips the fan-out entirely.
    """
    if not precollapse:
        postings = token_set(df, text_col, id_col)
        cand = lsh_candidates(minhash_signature(postings))
        return jaccard_for_pairs(postings, cand, min_x10k)
    members, rep_pairs = _exact_collapsed(df, text_col, id_col, min_x10k)
    ma, mb = members.alias("ma"), members.alias("mb")
    cross = (
        rep_pairs
        .join(ma, F.col("ma.rep") == F.col("a_id"))
        .join(mb, F.col("mb.rep") == F.col("b_id"))
        .select(
            F.least("ma.member", "mb.member").alias("a_id"),
            F.greatest("ma.member", "mb.member").alias("b_id"),
            "jac_x10k",
        )
    )
    if min_x10k > SCALE:
        return cross
    intra = (
        ma.join(mb, F.col("ma.rep") == F.col("mb.rep"))
        .filter(F.col("ma.member") < F.col("mb.member"))
        .select(
            F.col("ma.member").alias("a_id"),
            F.col("mb.member").alias("b_id"),
            F.lit(SCALE).cast("bigint").alias("jac_x10k"),
        )
    )
    return cross.unionByName(intra)


def dedup_resolution(df: DataFrame, min_x10k: int,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Full-corpus near-dup RESOLUTION: pairs → clusters → keepers.

    `minhash_dedup_pairs` emits the near-dup *pair list*; a corpus user
    wants the *deduplicated corpus*.  This closes the loop: connected
    components over the pair graph, keeper = min doc id per cluster.
    → one row per input doc: (id_col, cluster, keep) where `cluster`
    is the min doc id reachable through near-dup edges (singletons
    cluster with themselves) and `keep` marks the cluster's keeper —
    `df.join(resolution.filter("keep"), id_col, "left_semi")` IS the
    deduplicated corpus.

    Scale shape: exact duplicates are precollapsed to one rep per
    content fingerprint (`_exact_collapsed`) and enter the component
    graph as STAR edges (rep ↔ member, linear in cluster size, never
    the clique) — CC closes the transitivity, so a 10^7-copy
    boilerplate cluster contributes 10^7-1 edges, not 10^13.5 pairs.
    Near-dup pair building runs over distinct texts only (the
    LSH-blocked path, O(distinct·bands) shuffle); CC runs over rep
    pairs + star edges — a graph orders of magnitude smaller than the
    corpus; singletons re-attach with a left join that AQE sizes
    itself (broadcast when the clustered set is small, shuffle join
    when it is not — no forced broadcast, unlike the NIL-cluster path
    where the cluster map is provably vocabulary-sized).
    """
    from gaia_spark.operators.graph import connected_components

    members, rep_pairs = _exact_collapsed(df, text_col, id_col, min_x10k)
    star = (
        members.filter(F.col("member") != F.col("rep"))
        .select(F.col("rep").alias("src"), F.col("member").alias("dst"))
    )
    comps = connected_components(
        rep_pairs.select(F.col("a_id").alias("src"),
                         F.col("b_id").alias("dst"))
        .unionByName(star))
    return (
        df.select(F.col(id_col))
        .join(comps.select(F.col("node").alias(id_col),
                           F.col("component").alias("cluster")),
              id_col, "left")
        .withColumn("cluster", F.coalesce(F.col("cluster"), F.col(id_col)))
        .withColumn("keep", F.col(id_col) == F.col("cluster"))
    )


def sql_dedup_resolution(rel: str, min_x10k: int, text_col: str = "text",
                         id_col: str = "doc_id",
                         where: str = "TRUE") -> str:
    """DuckDB twin of dedup_resolution: exhaustive Jaccard pairs →
    recursive-CTE transitive closure → min-label components → keeper
    election.  Valid as the oracle for the LSH-blocked Spark path for
    the same reason as `minhash_dedup_pairs` (block-miss prob ≈1e-15
    at J≥0.9 with 128 perms / 32 bands)."""
    pairs = sql_jaccard_pairs(rel, min_x10k, text_col, id_col, where)
    return f"""
WITH RECURSIVE pair_base AS (
  SELECT a_id, b_id FROM ({pairs})
), edges AS (
  SELECT a_id AS src, b_id AS dst FROM pair_base
  UNION
  SELECT b_id, a_id FROM pair_base
), reach(node, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.node
), comps AS (
  SELECT node, min(comp) AS comp FROM reach GROUP BY node
)
SELECT d.{id_col},
       coalesce(c.comp, d.{id_col}) AS cluster,
       (d.{id_col} = coalesce(c.comp, d.{id_col})) AS keep
FROM (SELECT * FROM {rel} WHERE {where}) d
LEFT JOIN comps c ON c.node = d.{id_col}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col(postings: DataFrame) -> DataFrame:
    """→ (doc_id, simhash BIGINT): 64-bit sign-aggregated token hash.

    bit_j(simhash) = 1 iff sum over tokens of sign(bit_j(xxhash64(tok)))
    is positive.  Pure built-ins: per-token hash once, per-bit sign via
    shiftright/bitwise-and, one groupBy.
    """
    h = F.xxhash64(F.col("tok"), F.lit(MINHASH_SEED))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{j}")
        for j in range(64)
    ]
    agg = postings.groupBy("doc_id").agg(*bit_sums)
    acc = F.lit(0).cast("bigint")
    for j in range(64):
        acc = acc + F.when(F.col(f"b{j}") > 0,
                           F.shiftleft(F.lit(1).cast("bigint"), j)
                           ).otherwise(F.lit(0))
    return agg.select("doc_id", acc.alias("simhash"))


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       max_bucket: int = MAX_BAND_BUCKET) -> DataFrame:
    """Near-dup pairs by SimHash Hamming ≤ max_hamming, banded blocking.

    Pigeonhole: with 4 16-bit bands, Hamming ≤ 3 ⇒ ≥1 identical band,
    so blocking on band equality has perfect recall for t ≤ 3.
    → (a_id, b_id, hamming)

    Same hot-bucket guard as ``lsh_candidates``: the band self-join
    carries ids only (simhashes re-attach per candidate pair), and a
    band bucket above ``max_bucket`` — e.g. 10^7 exact copies of one
    boilerplate page, which agree in ALL four bands — emits star
    candidates (bucket-min ↔ member) instead of the d²/2 clique.
    Star pairs still verify by exact Hamming, and identical docs have
    distance 0, so duplicate mega-clusters keep full RESOLUTION
    connectivity through the star.  ``max_bucket=None`` disables.
    """
    from pyspark.sql.window import Window

    sims = simhash_col(token_set(df, text_col, id_col)).localCheckpoint()
    banded = sims.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("simhash"), 16 * k)
                .bitwiseAND(F.lit(0xFFFF))
                for k in range(4)
            ])
        ).alias("band_id", "band_val"),
    )
    if max_bucket is None:
        small, star = banded, None
    else:
        w = Window.partitionBy("band_id", "band_val")
        sized = banded.withColumn(
            "n", F.count(F.lit(1)).over(w)
        ).withColumn("bucket_min", F.min("doc_id").over(w))
        small = sized.filter(F.col("n") <= max_bucket).drop(
            "n", "bucket_min")
        star = (
            sized.filter((F.col("n") > max_bucket)
                         & (F.col("doc_id") != F.col("bucket_min")))
            .select(F.col("bucket_min").alias("a_id"),
                    F.col("doc_id").alias("b_id"))
        )
    a, b = small.alias("a"), small.alias("b")
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"))
    )
    if star is not None:
        cand = cand.unionByName(star)
    return (
        cand.distinct()
        .join(sims.select(F.col("doc_id").alias("a_id"),
                          F.col("simhash").alias("ha")), "a_id")
        .join(sims.select(F.col("doc_id").alias("b_id"),
                          F.col("simhash").alias("hb")), "b_id")
        .select(
            "a_id", "b_id",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# chunk-level exact dedup (CCNet-style paragraph dedup, deterministic
# chunking: the corpus has no newlines, so "paragraph" = successive
# fixed-width character chunks — the same relational shape either way)
# ---------------------------------------------------------------------------

def chunk_dedup_stats(df: DataFrame, chunk: int = 100,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-doc duplicated-chunk statistics against the WHOLE corpus.

    Chunks = successive ``chunk``-char substrings (last one short),
    hashed in-row (transform over a sequence — no per-chunk row until
    the single explode).  A chunk is "duplicated" iff its md5 occurs
    more than once corpus-wide (same-doc repeats count, as in CCNet's
    shard-level paragraph dedup).

    Sparse-duplicate shape (same split as canonicalize.dedup_triples):
    most chunks are corpus-unique, so re-shuffling the FULL chunk
    table by hash just to learn "count = 1" is the expensive no-op.
    Instead the (rare) duplicated hashes — the >1-count slice of the
    map-side-combined groupBy(h) — are broadcast back onto the chunk
    stream as a flag; unique chunks never touch a hash-keyed exchange
    a second time.  One corpus-wide exchange total carries actual
    rows: the groupBy(doc_id), and that one ships per-doc PARTIAL
    COUNTS after map-side combine, not chunks.  Fallback: a
    recrawl-heavy corpus with > ~4M duplicated hashes reverts to the
    classic freq join (broadcasting that slice would hurt).

    → (doc_id, n_chunks, n_dup_chunks, dup_chunk_frac_x10k).
    """
    from gaia_spark.functions.text_analysis import SCALE

    chunks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.length(text_col)
                               / F.lit(chunk)).cast("int") - 1,
                        F.lit(0)),
                ),
                lambda i: F.md5(F.substr(F.col(text_col),
                                         i * chunk + 1, F.lit(chunk))),
            )
        ).alias("h"),
    )
    dup_hashes = (
        chunks.groupBy("h").agg(F.count(F.lit(1)).alias("n_global"))
        .filter(F.col("n_global") > 1)
        .select("h")
        .localCheckpoint()
    )
    if dup_hashes.count() > 4_000_000:
        freq = chunks.groupBy("h").agg(
            F.count(F.lit(1)).alias("n_global"))
        marked = chunks.join(freq, "h").select(
            "doc_id", (F.col("n_global") > 1).alias("is_dup"))
    else:
        marked = chunks.join(
            F.broadcast(dup_hashes.withColumn("__d", F.lit(1))),
            "h", "left"
        ).select("doc_id", F.col("__d").isNotNull().alias("is_dup"))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("is_dup"), F.lit(1))
                  .otherwise(F.lit(0))).alias("n_dup_chunks"),
        )
        .select(
            "doc_id", "n_chunks", "n_dup_chunks",
            F.floor(F.lit(SCALE) * F.col("n_dup_chunks").cast("double")
                    / F.col("n_chunks").cast("double"))
            .alias("dup_chunk_frac_x10k"),
        )
    )


def sql_chunk_dedup_stats(rel: str, chunk: int = 100,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          where: str = "TRUE") -> str:
    """DuckDB twin of chunk_dedup_stats."""
    from gaia_spark.functions.text_analysis import SCALE

    return f"""
WITH chunks AS (
  SELECT {id_col} AS doc_id,
         md5(substr({text_col}, (i * {chunk} + 1)::INT, {chunk})) AS h
  FROM {rel},
       unnest(range(0, greatest(ceil(length({text_col}) / {chunk}.0)::INT
                                - 1, 0) + 1)) AS u(i)
  WHERE {where}
), freq AS (
  SELECT h, count(*) AS n_global FROM chunks GROUP BY h
)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN n_global > 1 THEN 1 ELSE 0 END)::BIGINT
         AS n_dup_chunks,
       floor({SCALE} * sum(CASE WHEN n_global > 1 THEN 1 ELSE 0 END)
             ::DOUBLE / count(*))::BIGINT AS dup_chunk_frac_x10k
FROM chunks JOIN freq USING (h)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# duplicated token-span detection (exact-substring dedup, the
# Lee et al. 2022 "Deduplicating Training Data Makes Language Models
# Better" signal at fixed window width: a W-token window occurring in
# more than one document marks memorization-prone boilerplate)
# ---------------------------------------------------------------------------

def dup_span_stats(df: DataFrame, w: int = 8,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc CROSS-document duplicated ``w``-token-window statistics.

    A window occurrence is duplicated iff its md5 occurs in ≥ 2
    DISTINCT documents (within-doc repetition is repetition_stats'
    job; cross-doc spans are the dedup signal).  Spread is detected
    with min(doc) ≠ max(doc) — two longs per hash after map-side
    combine, never a count(distinct doc).

    Sparse-duplicate shape (same split as chunk_dedup_stats): almost
    every window hash is corpus-unique, so the cross-doc slice of the
    groupBy(h) — tiny by construction — broadcasts back onto the span
    stream as a flag; unique spans never touch a hash-keyed exchange
    a second time.  The only exchange carrying per-doc rows is the
    final groupBy(doc_id), which ships map-side-combined partial
    counts.  Fallback above 4M duplicated hashes: classic freq join.

    → (doc_id, n_spans, n_dup_spans, dup_span_frac_x10k); docs with
    fewer than ``w`` tokens report 0 spans.
    """
    from gaia_spark.functions.text_analysis import SCALE

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    spans_arr = F.when(
        F.size("toks") >= w,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - w + 1),
            lambda i: F.md5(F.concat_ws(
                " ", *[F.element_at("toks", i + j) for j in range(w)])),
        ),
    ).otherwise(F.array().cast("array<string>"))
    spans = base.select(
        "doc_id", F.size("toks").alias("n_toks"),
        F.explode_outer(spans_arr).alias("h"))
    cross = (
        spans.filter(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.min("doc_id").alias("d_min"), F.max("doc_id").alias("d_max"))
        .filter(F.col("d_min") != F.col("d_max"))
        .select("h")
        .localCheckpoint()
    )
    if cross.count() > 4_000_000:
        spread = spans.filter(F.col("h").isNotNull()).groupBy("h").agg(
            (F.min("doc_id") != F.max("doc_id")).alias("is_dup"))
        marked = spans.join(spread, "h", "left")
        is_dup = F.coalesce(F.col("is_dup"), F.lit(False))
    else:
        marked = spans.join(
            F.broadcast(cross.withColumn("__d", F.lit(1))), "h", "left")
        is_dup = F.col("__d").isNotNull()
    return (
        marked.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("h").isNotNull(), F.lit(1))
                  .otherwise(F.lit(0))).alias("n_spans"),
            F.sum(F.when(is_dup & F.col("h").isNotNull(), F.lit(1))
                  .otherwise(F.lit(0))).alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            F.col("n_spans").cast("bigint").alias("n_spans"),
            F.col("n_dup_spans").cast("bigint").alias("n_dup_spans"),
            F.floor(F.lit(SCALE) * F.col("n_dup_spans").cast("double")
                    / F.greatest("n_spans", F.lit(1)).cast("double"))
            .alias("dup_span_frac_x10k"),
        )
    )


def sql_dup_span_stats(rel: str, w: int = 8,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       where: str = "TRUE") -> str:
    """DuckDB twin of dup_span_stats (same windows, same spread rule)."""
    from gaia_spark.functions.text_analysis import SCALE

    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}), '\\s+'),
                     t -> t <> '') AS toks
  FROM {rel} WHERE {where}
), spans AS (
  SELECT doc_id,
         md5(array_to_string(toks[i:i + {w - 1}], ' ')) AS h
  FROM base, unnest(range(1, greatest(len(toks) - {w}, -1) + 2)) AS u(i)
), spread AS (
  SELECT h FROM spans GROUP BY h HAVING min(doc_id) <> max(doc_id)
), marked AS (
  SELECT s.doc_id, s.h, (spread.h IS NOT NULL) AS is_dup
  FROM spans s LEFT JOIN spread ON s.h = spread.h
)
SELECT base.doc_id,
       coalesce(m.n_spans, 0)::BIGINT AS n_spans,
       coalesce(m.n_dup, 0)::BIGINT AS n_dup_spans,
       floor({SCALE} * coalesce(m.n_dup, 0)::DOUBLE
             / greatest(coalesce(m.n_spans, 0), 1))::BIGINT
         AS dup_span_frac_x10k
FROM base
LEFT JOIN (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup
  FROM marked GROUP BY doc_id
) m USING (doc_id)
"""


# ---------------------------------------------------------------------------
# cross-snapshot delta dedup (crawl-refresh ingestion)
# ---------------------------------------------------------------------------

def snapshot_delta(new_df: DataFrame, old_df: DataFrame,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Rows of ``new_df`` whose content is absent from ``old_df``.

    The standard crawl-refresh operator: when a new snapshot (e.g. a
    monthly Common-Crawl dump) lands, only content-new documents enter
    the pipeline.  Both sides are projected to their md5 content
    fingerprints BEFORE the join, so the shuffle carries 32-byte hex
    keys (plus the id on the new side) — document text never moves,
    which is the property that matters when both snapshots are ~100 TB.
    The old side is deduplicated first (fingerprint set, map-side
    combined); the anti-join is a plain shuffled join on the
    fingerprint, which AQE converts to broadcast when the old side's
    distinct set is small.

    → (doc_id, fp) for content-new documents.
    """
    newf = new_df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.md5(F.col(text_col)).alias("fp"))
    oldf = old_df.select(F.md5(F.col(text_col)).alias("fp")).distinct()
    return newf.join(oldf, "fp", "left_anti").select("doc_id", "fp")


def sql_snapshot_delta(new_rel: str, old_rel: str,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB twin of snapshot_delta (NOT IN over the old fp set)."""
    return f"""
SELECT {id_col}::BIGINT AS doc_id, md5({text_col}) AS fp
FROM ({new_rel})
WHERE md5({text_col}) NOT IN (SELECT md5({text_col}) FROM ({old_rel}))
"""


def edit_similarity(pairs: DataFrame,
                    a_col: str = "text_a",
                    b_col: str = "text_b") -> DataFrame:
    """Edit-distance verification for candidate near-dup pairs →
    input columns + (len_a, len_b, lev, sim_x10k).

    The FUZZY verification tier under the exact/Jaccard/MinHash
    family: token-level measures miss single-character churn
    (OCR noise, typo farms, template fills), Levenshtein catches it.
    ``sim_x10k = 10000 − (10000·lev) div max(len_a, len_b, 1)`` —
    pure integers; both engines implement classic Levenshtein (ASCII
    / codepoint-exact, no unicode-normalization divergence on the
    pipeline's canonicalized text).

    Scale discipline: O(len²) per pair means this NEVER runs on the
    corpus cross product — it verifies an upstream candidate
    generator's pairs (LSH bands, prefix filter, embedding blocks),
    exactly like jaccard_for_pairs.  Pure in-row codegen over the
    pair stream; text enters the plan only on the candidate rows.
    """
    la = F.length(F.col(a_col)).cast("bigint")
    lb = F.length(F.col(b_col)).cast("bigint")
    lev = F.levenshtein(F.col(a_col), F.col(b_col)).cast("bigint")
    return (pairs
            .withColumn("len_a", la)
            .withColumn("len_b", lb)
            .withColumn("lev", lev)
            .withColumn(
                "sim_x10k",
                F.lit(10000).cast("bigint")
                - F.expr("(10000 * lev) div greatest(len_a, len_b, 1)")
            ))


def sql_edit_similarity(pairs_sql: str,
                        a_col: str = "text_a",
                        b_col: str = "text_b") -> str:
    """DuckDB twin of :func:`edit_similarity` (levenshtein is the
    same classic DP on both engines)."""
    return f"""
SELECT *,
       (10000 - (10000 * lev) // greatest(len_a, len_b, 1))::BIGINT
         AS sim_x10k
FROM (
  SELECT p.*,
         length({a_col})::BIGINT AS len_a,
         length({b_col})::BIGINT AS len_b,
         levenshtein({a_col}, {b_col})::BIGINT AS lev
  FROM ({pairs_sql}) p
)
"""


#: CDC rolling-hash parameters, shared verbatim with the SQL twin:
#: window w, base B, modulus M (prime), boundary divisor D → expected
#: chunk length ≈ D characters past the window.
CDC_W = 8
CDC_B = 31
CDC_M = 1000003
CDC_D = 16


def cdc_chunks(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Content-defined chunking (LBFS/rsync family) → (doc_id,
    chunk_idx, start, chunk_len, chunk_md5): split each document at
    positions where the w-char rolling hash ≡ 0 (mod D).

    The SHIFT-RESISTANT chunker fixed-size chunking cannot be: an
    insertion near the head re-aligns every fixed-size block but
    only perturbs CDC chunks up to the next content-defined
    boundary — the property that makes chunk-level dedup work on
    near-identical pages (and binary/media payloads) across crawls.
    Boundaries are a pure function of the local window
    (``h_i = Σ_k ascii(s[i−k])·B^k mod M``, k < w), so both engines
    cut identically.

    Scale shape: the whole chunker is IN-ROW whole-stage codegen —
    per position an unrolled w-term polynomial (O(n·w) character
    reads per doc, no Python, no shuffle); only (doc_id, idx,
    offsets, 32-byte fingerprints) leave the row.  Downstream
    chunk-level dedup is the standard fingerprint groupBy.
    """
    n = F.length(F.col(text_col))
    # BIGINT(ascii): B^7 = 31^7 ≈ 2.75e10 overflows INT under ANSI
    h_terms = " + ".join(
        f"BIGINT(ascii(substring({text_col}, i - {k}, 1)))"
        f" * CAST({CDC_B ** k} AS BIGINT)"
        for k in range(CDC_W))
    bounds = F.expr(
        f"filter(sequence({CDC_W}, length({text_col})), "
        f"i -> i < length({text_col}) "
        f"AND (({h_terms}) % {CDC_M}) % {CDC_D} = 0)")
    ends = F.concat(bounds, F.array(n))
    chunks = F.expr(
        "transform(ends, (e, j) -> struct("
        "j + 1 AS chunk_idx, "
        "CASE WHEN j = 0 THEN 1 ELSE ends[j - 1] + 1 END AS start, "
        "e AS fin))")
    return (
        df.filter(n >= 1)
        .select(F.col(id_col).alias("doc_id"),
                F.col(text_col).alias("_t"),
                ends.alias("ends"))
        .select("doc_id", "_t", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.start").cast("bigint").alias("start"),
            (F.col("c.fin") - F.col("c.start") + 1).cast("bigint")
            .alias("chunk_len"),
            F.md5(F.expr("substring(_t, c.start, "
                         "c.fin - c.start + 1)").cast("binary"))
            .alias("chunk_md5"))
    )


def sql_cdc_chunks(rel: str, text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`cdc_chunks` (same window polynomial,
    same boundary rule, same md5 fingerprints)."""
    h_terms = " + ".join(
        f"ascii(substring(t, i - {k}, 1))::BIGINT"
        f" * {CDC_B ** k}::BIGINT"
        for k in range(CDC_W))
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {text_col} AS t
  FROM {rel} WHERE length({text_col}) >= 1
), be AS (
  SELECT doc_id, t,
         list_concat(
           list_filter(range({CDC_W}, length(t) + 1),
                       i -> i < length(t)
                            AND (({h_terms}) % {CDC_M}) % {CDC_D} = 0),
           [length(t)]) AS ends
  FROM base
), ex AS (
  SELECT doc_id, t, ends,
         unnest(range(1, len(ends) + 1)) AS j
  FROM be
)
SELECT doc_id,
       j::INT AS chunk_idx,
       (CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END)::BIGINT
         AS start,
       (ends[j] - (CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END)
        + 1)::BIGINT AS chunk_len,
       md5(substring(t, (CASE WHEN j = 1 THEN 1
                         ELSE ends[j - 1] + 1 END)::INT,
                     (ends[j] - (CASE WHEN j = 1 THEN 1
                                 ELSE ends[j - 1] + 1 END) + 1)::INT))
         AS chunk_md5
FROM ex
"""
