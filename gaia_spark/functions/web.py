"""Web-corpus URL operators: parse, normalize, aggregate by host.

A Common-Crawl-style pipeline spends a lot of its relational time on
URL columns: host extraction for per-site policies, registered-domain
rollups for skew handling (host is THE Zipf-skewed key in web data —
gaia_spark/functions/skew.py salts on it), TLD slices, path depth for
boilerplate heuristics.  The KG pipeline's pages table carries real
urls; the driver's `documents` table does not, so the ★-oracled query
synthesizes deterministic urls from (source, doc_id) first — the parse
and the rollup are the operators under test, and they run on any url
string.

Spark side uses ``parse_url`` (JVM built-in, whole-stage codegen);
the DuckDB twin mirrors it with a regex that agrees on every http(s)
url (no userinfo/port in the synthesized corpus; the twin is exact on
the test domain, documented approximate outside it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: regex twins (Java + RE2-safe syntax; used verbatim in the oracle)
HOST_RE = r"^[a-z]+://([^/?#]+)"
PATH_RE = r"^[a-z]+://[^/?#]+(/[^?#]*)?"


def synth_url(doc_id: Column, source: Column) -> Column:
    """Deterministic synthetic url for tables that lack one."""
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")),
        (doc_id % 3 + 1).cast("int"))
    return F.concat(
        F.lit("https://"),
        F.when(doc_id % 7 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lower(source), F.lit("-"), (doc_id % 50).cast("string"),
        F.lit(".example."), tld,
        F.lit("/p/"), (doc_id % 11).cast("string"),
        F.when(doc_id % 2 == 0,
               F.concat(F.lit("/item-"), doc_id.cast("string")))
        .otherwise(F.lit("")),
    )


def sql_synth_url(doc_id: str = "doc_id", source: str = "source") -> str:
    return (
        f"'https://' || CASE WHEN {doc_id} % 7 = 0 THEN 'www.' ELSE '' END"
        f" || lower({source}) || '-' || ({doc_id} % 50)::VARCHAR"
        f" || '.example.' || (['com','org','net'])[({doc_id} % 3 + 1)::INT]"
        f" || '/p/' || ({doc_id} % 11)::VARCHAR"
        f" || CASE WHEN {doc_id} % 2 = 0 THEN '/item-' || {doc_id}::VARCHAR"
        f" ELSE '' END"
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """host / registered_domain / tld / path / path_depth columns.

    - host: parse_url HOST (lowercased)
    - registered_domain: last two dot-labels of the host ("example.com"
      for "www.a.example.com") — the skew/rollup key
    - tld: last label
    - path_depth: number of non-empty path segments
    """
    u = F.col(url_col)
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    reg = F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, n - 1),
                    F.element_at(labels, n)),
    ).otherwise(host)
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return (
        df.withColumn("host", host)
        .withColumn("registered_domain", reg)
        .withColumn("tld", F.element_at(labels, n))
        .withColumn("path", path)
        .withColumn("path_depth", depth.cast("bigint"))
    )


def sql_url_parts_select(url: str = "url") -> str:
    """SELECT-list fragment mirroring with_url_parts (DuckDB)."""
    host = f"lower(regexp_extract({url}, '{HOST_RE}', 1))"
    labels = f"string_split({host}, '.')"
    path = f"coalesce(regexp_extract({url}, '{PATH_RE}', 1), '')"
    return (
        f"{host} AS host, "
        f"CASE WHEN len({labels}) >= 2 THEN "
        f"  {labels}[-2] || '.' || {labels}[-1] ELSE {host} END"
        f"  AS registered_domain, "
        f"{labels}[-1] AS tld, "
        f"{path} AS path, "
        f"len(list_filter(string_split({path}, '/'), s -> s <> ''))"
        f"::BIGINT AS path_depth"
    )


def host_rollup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-registered-domain corpus stats: the site-level policy table.

    One map-side-combined shuffle keyed by registered_domain; at web
    scale this key is Zipf-skewed, which is exactly what AQE skew
    handling + skew.py salting are for (partial aggregation makes the
    skew harmless here — each mapper emits one partial per domain).
    """
    return (
        df.groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("host").alias("n_hosts"),
            F.sum(F.length(text_col)).alias("total_chars"),
            F.max("path_depth").alias("max_path_depth"),
            F.sum(F.when(F.col("host").startswith("www."), F.lit(1))
                  .otherwise(F.lit(0))).alias("n_www"),
        )
    )


def sql_host_rollup(inner: str, text_col: str = "text") -> str:
    """DuckDB twin over an ``inner`` relation providing url parts."""
    return f"""
SELECT registered_domain,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT host)::BIGINT AS n_hosts,
       sum(length({text_col}))::BIGINT AS total_chars,
       max(path_depth)::BIGINT AS max_path_depth,
       sum(CASE WHEN starts_with(host, 'www.') THEN 1 ELSE 0 END)
         ::BIGINT AS n_www
FROM ({inner})
GROUP BY registered_domain
"""


# ---------------------------------------------------------------------------
# outlink extraction → host-level link graph
# ---------------------------------------------------------------------------

#: absolute-href anchor matcher (syntax common to Java regex and RE2;
#: used verbatim in the DuckDB twin)
ANCHOR_RE = r'<a href="(https?://[^"]+)"'


def synth_html(doc_id: Column, source: Column, text: Column) -> Column:
    """Deterministic html wrapper with 1–2 absolute outlinks, for
    tables that carry text but no html.  Link targets are synth_url
    at derived doc ids, so the resulting host graph is nontrivial
    (Zipf-ish in-degree via the % 1000 fold)."""
    a1 = synth_url((doc_id * 31 + 1) % 1000, source)
    a2 = synth_url((doc_id * 17 + 2) % 1000, source)
    return F.concat(
        F.lit("<html><body><p>"), F.substring(text, 1, 120),
        F.lit('</p><a href="'), a1, F.lit('">'),
        F.substring(text, 1, 15), F.lit("</a>"),
        F.when(doc_id % 3 == 0,
               F.concat(F.lit('<a href="'), a2, F.lit('">'),
                        F.substring(text, 16, 15), F.lit("</a>")))
        .otherwise(F.lit("")),
        F.lit("</body></html>"),
    )


def sql_synth_html(doc_id: str = "doc_id", source: str = "source",
                   text: str = "text") -> str:
    a1 = sql_synth_url(f"(({doc_id} * 31 + 1) % 1000)", source)
    a2 = sql_synth_url(f"(({doc_id} * 17 + 2) % 1000)", source)
    return (
        f"'<html><body><p>' || substr({text}, 1, 120)"
        f" || '</p><a href=\"' || {a1} || '\">'"
        f" || substr({text}, 1, 15) || '</a>'"
        f" || CASE WHEN {doc_id} % 3 = 0 THEN"
        f" '<a href=\"' || {a2} || '\">'"
        f" || substr({text}, 16, 15) || '</a>' ELSE '' END"
        f" || '</body></html>'"
    )


def extract_outlinks(df: DataFrame, html_col: str = "html",
                     src_host_col: str = "host") -> DataFrame:
    """(src_host, dst_host) edge stream from absolute hrefs.

    regexp_extract_all + explode are narrow JVM ops (whole-stage
    codegen); the html column never enters a shuffle — only the two
    host strings leave the row.  Self-links (same host) are dropped.
    """
    links = df.select(
        F.col(src_host_col).alias("src_host"),
        F.explode(F.regexp_extract_all(
            F.col(html_col), F.lit(ANCHOR_RE), F.lit(1))).alias("link"),
    )
    return (
        links.withColumn(
            "dst_host",
            F.lower(F.regexp_extract("link", HOST_RE, 1)))
        .filter(F.col("dst_host") != F.col("src_host"))
        .select("src_host", "dst_host")
    )


def host_link_graph(edges: DataFrame) -> DataFrame:
    """Weighted host-level link graph: one map-side-combined shuffle
    keyed by (src_host, dst_host).  The output is PageRank-ready
    (operators/graph.py) and is the standard web-curation side input
    (domain authority, spam neighborhoods)."""
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def sql_host_link_graph(pages: str) -> str:
    """DuckDB twin over a ``pages`` relation with (url, html)."""
    return f"""
WITH parts AS (
  SELECT lower(regexp_extract(url, '{HOST_RE}', 1)) AS src_host, html
  FROM ({pages})
), links AS (
  SELECT src_host,
         unnest(regexp_extract_all(html, '{ANCHOR_RE}', 1)) AS link
  FROM parts
), edges AS (
  SELECT src_host,
         lower(regexp_extract(link, '{HOST_RE}', 1)) AS dst_host
  FROM links
)
SELECT src_host, dst_host, count(*)::BIGINT AS weight
FROM edges WHERE dst_host <> src_host
GROUP BY src_host, dst_host
"""


def sql_outlink_edges(pages: str) -> str:
    """DuckDB twin of :func:`extract_outlinks` over a ``(url, html)``
    relation: the raw (src, dst) host edge stream that
    host_link_graph aggregates and cocitation consumes."""
    return f"""
SELECT src_host AS src, dst_host AS dst FROM (
  SELECT src_host,
         lower(regexp_extract(link, '{HOST_RE}', 1)) AS dst_host
  FROM (
    SELECT lower(regexp_extract(url, '{HOST_RE}', 1)) AS src_host,
           unnest(regexp_extract_all(html, '{ANCHOR_RE}', 1)) AS link
    FROM ({pages})
  )
) WHERE dst_host <> src_host
"""


def outlink_edges_by_url(df: DataFrame, html_col: str = "html",
                         url_col: str = "url",
                         host_col: str = "host") -> DataFrame:
    """(src=url, dst=dst_host) citation stream — the PAGE-level
    variant of :func:`extract_outlinks` (host-level collapse loses
    which page did the citing; co-citation needs the page).  Same
    narrow JVM shape: regexp + explode in-row, html never shuffles,
    self-host links dropped."""
    links = df.select(
        F.col(url_col).alias("src"),
        F.col(host_col).alias("src_host"),
        F.explode(F.regexp_extract_all(
            F.col(html_col), F.lit(ANCHOR_RE), F.lit(1))).alias("link"),
    )
    return (
        links.withColumn(
            "dst", F.lower(F.regexp_extract("link", HOST_RE, 1)))
        .filter(F.col("dst") != F.col("src_host"))
        .select("src", "dst")
    )


def sql_outlink_edges_by_url(pages: str) -> str:
    """DuckDB twin of :func:`outlink_edges_by_url`."""
    return f"""
SELECT src, dst FROM (
  SELECT url AS src,
         lower(regexp_extract(url, '{HOST_RE}', 1)) AS src_host,
         lower(regexp_extract(link, '{HOST_RE}', 1)) AS dst
  FROM (
    SELECT url,
           unnest(regexp_extract_all(html, '{ANCHOR_RE}', 1)) AS link
    FROM ({pages})
  )
) WHERE dst <> src_host
"""


# ---------------------------------------------------------------------------
# URL canonicalization (dedup key for crawl frontiers / url-level dedup)
# ---------------------------------------------------------------------------

#: query params dropped by canonicalization (tracking noise); prefix
#: syntax shared verbatim with the DuckDB twin
TRACKING_PARAM_RE = r"^(utm_|gclid=|fbclid=|ref=)"
#: scheme + query twins (lowercase-scheme http(s) — same documented
#: exactness domain as HOST_RE/PATH_RE above)
SCHEME_RE = r"^([a-z]+)://"
QUERY_RE = r"\?(.*)$"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a url, the key for url-level dedup.

    Steps (all pure column expressions — whole-stage codegen, no
    Python, nothing leaves the row):

    1. strip the fragment (``#...``),
    2. lowercase scheme and host, strip a leading ``www.``,
    3. strip trailing ``/`` runs from the path,
    4. drop tracking params (utm_*/gclid/fbclid/ref) and SORT the
       survivors, so param order never splits a dedup group.

    Exact cross-engine (sql_canonicalize_cte) on lowercase-scheme
    http(s) urls without userinfo/port — the documented domain of
    HOST_RE; outside it the twin is approximate, like with_url_parts.
    """
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, SCHEME_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(no_frag, HOST_RE, 1)), r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(no_frag, PATH_RE, 1), "/+$", "")
    q = F.regexp_extract(no_frag, QUERY_RE, 1)
    keep = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qs = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))


def synth_messy_url(doc_id: Column, source: Column) -> Column:
    """Deterministic messy url whose CANONICAL form depends only on
    (source, doc_id % 40): the base url and the surviving params are
    derived from the folded key k, while trailing slash, tracking
    param, param ORDER, and fragment vary with the full doc_id — so
    distinct raw urls genuinely collapse to shared canonical dedup
    keys (the property the web_canonical query exercises)."""
    k = doc_id % 40
    head = F.concat(
        synth_url(k, source),
        F.when(doc_id % 4 == 0, F.lit("/")).otherwise(F.lit("")))
    utm = F.concat(F.lit("utm_source=s"), (doc_id % 7).cast("string"))
    idp = F.concat(F.lit("id="), (k % 5).cast("string"))
    b = F.when(k % 2 == 0, F.lit("&b=2")).otherwise(F.lit(""))
    q = F.when(
        doc_id % 2 == 0, F.concat(utm, F.lit("&"), idp, b)
    ).otherwise(F.concat(idp, b, F.lit("&"), utm))
    frag = F.when(doc_id % 6 == 0, F.lit("#frag")).otherwise(F.lit(""))
    return F.concat(head, F.lit("?"), q, frag)


def sql_synth_messy_url(doc_id: str = "doc_id",
                        source: str = "source") -> str:
    k = f"({doc_id} % 40)"
    utm = f"'utm_source=s' || ({doc_id} % 7)::VARCHAR"
    idp = f"'id=' || ({k} % 5)::VARCHAR"
    b = f"CASE WHEN {k} % 2 = 0 THEN '&b=2' ELSE '' END"
    return (
        f"{sql_synth_url(k, source)}"
        f" || CASE WHEN {doc_id} % 4 = 0 THEN '/' ELSE '' END"
        f" || '?' || CASE WHEN {doc_id} % 2 = 0"
        f" THEN {utm} || '&' || {idp} || {b}"
        f" ELSE {idp} || {b} || '&' || {utm} END"
        f" || CASE WHEN {doc_id} % 6 = 0 THEN '#frag' ELSE '' END"
    )


def sql_canonicalize_cte(inner: str, url: str = "url") -> str:
    """DuckDB twin: relation (doc_id, canonical_url) over ``inner``
    providing (doc_id, url).  Mirrors canonicalize_url step-for-step;
    list_sort/array_sort agree on ASCII param strings."""
    return f"""
SELECT doc_id,
       scheme || '://' || host || path ||
       CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
FROM (
  SELECT doc_id, scheme, host, path,
         array_to_string(list_sort(list_filter(
           string_split(q, '&'),
           x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')
         )), '&') AS qs
  FROM (
    SELECT doc_id,
           lower(regexp_extract(u, '{SCHEME_RE}', 1)) AS scheme,
           regexp_replace(lower(regexp_extract(u, '{HOST_RE}', 1)),
                          '^www\\.', '') AS host,
           regexp_replace(coalesce(regexp_extract(u, '{PATH_RE}', 1),
                                   ''), '/+$', '') AS path,
           coalesce(regexp_extract(u, '\\?(.*)$', 1), '') AS q
    FROM (SELECT doc_id, regexp_replace({url}, '#.*$', '') AS u
          FROM ({inner}))
  )
)
"""


# ---------------------------------------------------------------------------
# Domain-blocklist filtering (C4/RefinedWeb-style URL curation)
# ---------------------------------------------------------------------------

#: boilerplate line classifier shared verbatim with the DuckDB twin.
#: Exact on the synthesized-page domain (nav/footer lines are Title-
#: case or symbol-led; corpus content is lowercase words) — outside it
#: this is the usual jusText-style heuristic, not a parser.
NAV_LINE_RE = (
    r"^(Home|About|Contact|Login|Privacy|Terms|Subscribe|Share|Sign"
    r"|Copyright|©|Cookie)")
MIN_CONTENT_CHARS = 30


def host_suffixes(host: Column) -> Column:
    """All dot-boundary suffixes of a host, most-specific first:
    ``a.b.example.com → [a.b.example.com, b.example.com, example.com,
    com]``.  Pure in-row array ops, bounded by the label count (≤ ~6
    on real hosts) — the standard trick that turns subdomain matching
    into an EQUI-join a blocklist can broadcast against."""
    parts = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(
            F.slice(parts, i, F.size(parts)), "."))


def blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    host_col: str = "host",
    key_col: str = "doc_id",
    broadcast_hits: bool = True,
) -> DataFrame:
    """Drop rows whose host equals — or is a subdomain of — any
    ``blocked.pattern`` (label-boundary suffix semantics: pattern
    ``example.net`` blocks ``www.a.example.net`` but never
    ``notexample.net``).

    Shape at 100 TB: ONLY (key, suffix) pairs leave the corpus rows
    (bounded ≤ labels-per-host fan-out), the blocklist side of the
    semi-join is broadcast, and the blocked-key set anti-joins back
    with a STATIC broadcast hint — without it Catalyst cannot size
    the aggregated hits subplan and plans sort-merge, whose corpus-
    side exchange materializes before AQE can observe the tiny build
    (stages launch bottom-up in parallel).  Net: zero corpus
    shuffles; the only keyed exchange carries blocked keys.  For a
    pathological blocklist expected to match a large corpus fraction,
    pass ``broadcast_hits=False`` to fall back to the AQE-planned
    keyed anti-join (plan-shape test: test_plan_shapes_r3.py).
    """
    hits = (
        df.select(F.col(key_col),
                  F.explode(host_suffixes(F.col(host_col))).alias("sfx"))
        .join(F.broadcast(blocked.select(F.col("pattern").alias("sfx"))),
              "sfx", "left_semi")
        .select(key_col)
        .distinct()
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    return df.join(hits, key_col, "left_anti")


def sql_blocklist_filter(inner: str, blocked_values: list[str],
                         host_col: str = "host",
                         key_col: str = "doc_id") -> str:
    """DuckDB twin; ``blocked_values`` are escaped into a VALUES list."""
    vals = ", ".join(
        "('" + p.replace("'", "''") + "')" for p in blocked_values)
    return f"""
WITH d AS ({inner}),
blocked(pattern) AS (VALUES {vals}),
sfx AS (
  SELECT {key_col}, unnest(list_transform(
      generate_series(1, len(string_split({host_col}, '.'))),
      i -> array_to_string(string_split({host_col}, '.')[i:], '.')
  )) AS sfx
  FROM d
),
hits AS (
  SELECT DISTINCT {key_col} FROM sfx JOIN blocked ON sfx.sfx = blocked.pattern
)
SELECT * FROM d ANTI JOIN hits USING ({key_col})
"""


# ---------------------------------------------------------------------------
# Boilerplate line removal (jusText-lite over page lines)
# ---------------------------------------------------------------------------


def synth_boiler_page(doc_id: Column, text: Column) -> Column:
    """Deterministic page: the document text wrapped in nav/footer
    boilerplate lines (twin: sql_synth_boiler_page)."""
    return F.concat_ws(
        "\n",
        F.lit("Home | About | Contact | Login"),
        F.when(doc_id % 3 == 0, F.lit("Subscribe to our newsletter"))
        .otherwise(F.lit("Cookie notice: this site uses cookies")),
        # concat_ws SKIPS null elements (line-count divergence vs the
        # twin's coalesce) — sentinel '' keeps the 6-line shape
        F.coalesce(text, F.lit("")),
        F.when(doc_id % 2 == 0, F.lit("Share this page")).otherwise(
            F.concat(F.lit("Sign in to comment ("),
                     (doc_id % 97).cast("string"), F.lit(")"))),
        F.lit("© 2026 example.com — All rights reserved"),
        F.lit("Privacy Policy | Terms of Use"),
    )


def sql_synth_boiler_page(doc_id: str = "doc_id",
                          text: str = "text") -> str:
    return (
        "concat_ws(chr(10), 'Home | About | Contact | Login', "
        f"CASE WHEN {doc_id} % 3 = 0 THEN 'Subscribe to our newsletter' "
        "ELSE 'Cookie notice: this site uses cookies' END, "
        f"coalesce({text}, ''), "
        f"CASE WHEN {doc_id} % 2 = 0 THEN 'Share this page' "
        f"ELSE 'Sign in to comment (' || ({doc_id} % 97)::VARCHAR || ')' "
        "END, "
        "'© 2026 example.com — All rights reserved', "
        "'Privacy Policy | Terms of Use')"
    )


def strip_boilerplate(page: Column) -> Column:
    """(content, n_lines, n_kept) struct: lines shorter than
    MIN_CONTENT_CHARS or matching NAV_LINE_RE are dropped, survivors
    re-joined.  Pure in-row split/filter/join — whole-stage codegen,
    nothing but the page column is touched, trivially parallel at any
    scale (the 100 TB boilerplate pass is scan-bound by design)."""
    lines = F.split(page, "\n")
    kept = F.filter(
        lines,
        lambda ln: (F.length(ln) >= MIN_CONTENT_CHARS)
        & ~ln.rlike(NAV_LINE_RE))
    return F.struct(
        F.array_join(kept, "\n").alias("content"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
    )


def sql_strip_boilerplate_select(page_expr: str) -> str:
    """DuckDB twin fragment: content / n_lines / n_kept columns from a
    page expression (same constants, same rule)."""
    lines = f"string_split({page_expr}, chr(10))"
    kept = (f"list_filter({lines}, ln -> length(ln) >= "
            f"{MIN_CONTENT_CHARS} AND NOT regexp_matches(ln, "
            f"'{NAV_LINE_RE}'))")
    return (
        f"array_to_string({kept}, chr(10)) AS content, "
        f"len({lines})::BIGINT AS n_lines, "
        f"len({kept})::BIGINT AS n_kept"
    )


# ---------------------------------------------------------------------------
# Inlink anchor-text aggregation (KG node descriptions from the web)
# ---------------------------------------------------------------------------

#: href + inner-text matcher (Java-regex/RE2-common syntax; used
#: verbatim in the DuckDB twin).  Extracting group 1 and group 2 with
#: two regexp_extract_all calls over the SAME pattern yields
#: positionally-aligned lists — the zip is exact by construction.
ANCHOR_TEXT_RE = r'<a href="(https?://[^"]+)">([^<]*)</a>'


def anchor_stats(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Per-target-host inlink anchor census → (dst_host, n_inlinks,
    n_anchors, top_anchor): the classic web-KG node-attribute builder
    (an entity's best surface form is what the web calls it when
    linking to it).

    Shape at 100 TB: html is consumed in-row (two regexp_extract_all
    passes + zip_with; nothing but (dst_host, anchor) pairs leave the
    scan), then one (dst_host, anchor)-keyed map-side-combined count
    and one dst_host-keyed rollup.  top_anchor is an order-free
    ``max_by`` over the zero-padded ``(count, anchor)`` sort key —
    deterministic under any partitioning, and the identical VARCHAR
    trick runs in the DuckDB twin (which can't compare structs in
    max_by).
    """
    links = F.regexp_extract_all(
        F.col(html_col), F.lit(ANCHOR_TEXT_RE), F.lit(1))
    anchors = F.regexp_extract_all(
        F.col(html_col), F.lit(ANCHOR_TEXT_RE), F.lit(2))
    pairs = (
        df.select(F.explode(F.zip_with(
            links, anchors,
            lambda l, a: F.struct(l.alias("link"), a.alias("anchor"))
        )).alias("z"))
        .select(
            F.lower(F.regexp_extract("z.link", HOST_RE, 1))
            .alias("dst_host"),
            F.col("z.anchor").alias("anchor"))
    )
    per_anchor = (
        pairs.groupBy("dst_host", "anchor")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sort_key = F.concat(
        F.lpad(F.col("cnt").cast("string"), 12, "0"), F.col("anchor"))
    return (
        per_anchor.groupBy("dst_host")
        .agg(F.sum("cnt").alias("n_inlinks"),
             F.count(F.lit(1)).alias("n_anchors"),
             F.max_by("anchor", sort_key).alias("top_anchor"))
    )


def sql_anchor_stats(pages: str, html_col: str = "html") -> str:
    """DuckDB twin over a ``pages`` relation carrying ``html``.

    Multiple ``unnest`` calls in one SELECT are positionally aligned
    (the same zip the Spark side does with zip_with)."""
    return f"""
WITH pairs AS (
  SELECT lower(regexp_extract(link, '{HOST_RE}', 1)) AS dst_host,
         anchor
  FROM (
    SELECT
      unnest(regexp_extract_all({html_col}, '{ANCHOR_TEXT_RE}', 1))
        AS link,
      unnest(regexp_extract_all({html_col}, '{ANCHOR_TEXT_RE}', 2))
        AS anchor
    FROM ({pages})
  )
), per_anchor AS (
  SELECT dst_host, anchor, count(*)::BIGINT AS cnt
  FROM pairs GROUP BY dst_host, anchor
)
SELECT dst_host,
       sum(cnt)::BIGINT AS n_inlinks,
       count(*)::BIGINT AS n_anchors,
       max_by(anchor, lpad(cnt::VARCHAR, 12, '0') || anchor)
           AS top_anchor
FROM per_anchor GROUP BY dst_host
"""


# ---------------------------------------------------------------------------
# robots.txt policy: parse → longest-match verdict per URL
# ---------------------------------------------------------------------------

#: rule-line shape shared by both engines (Java regex and RE2 read it
#: identically): "Allow: /prefix" / "Disallow: /prefix"
ROBOTS_LINE_RE = r"^(Allow|Disallow): (/[^ ]*)"


def synth_robots(host: Column) -> Column:
    """Deterministic robots.txt per host (flat wildcard-agent
    profile): a Disallow on one /p/<i> section, an Allow carve-out
    for its /item- subtree, and on half the hosts a second Disallow —
    enough structure to exercise parse, longest-match, and the
    allow-beats-disallow tie rule."""
    b = (F.conv(F.substring(F.md5(host), 1, 8), 16, 10)
         .cast("bigint") % 10)
    # b is already in [0, 10): the section is b itself.  sec2 wraps
    # mod 11 so the second Disallow can land on sections 0/1 too.
    sec = b.cast("string")
    sec2 = ((b + 3) % 11).cast("string")
    return F.concat(
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /p/"), sec, F.lit("\n"),
        F.lit("Allow: /p/"), sec, F.lit("/item-"), F.lit("\n"),
        F.when(b % 2 == 0,
               F.concat(F.lit("Disallow: /p/"), sec2, F.lit("\n")))
        .otherwise(F.lit("")))


def sql_synth_robots(host: str) -> str:
    """DuckDB twin of synth_robots."""
    b = f"(('0x' || substr(md5({host}), 1, 8))::BIGINT % 10)"
    return (
        f"'User-agent: *' || chr(10)"
        f" || 'Disallow: /p/' || {b}::VARCHAR || chr(10)"
        f" || 'Allow: /p/' || {b}::VARCHAR || '/item-' || chr(10)"
        f" || CASE WHEN {b} % 2 = 0 THEN"
        f"      'Disallow: /p/' || (({b} + 3) % 11)::VARCHAR || chr(10)"
        f"    ELSE '' END")


def robots_rules(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots bodies → (host, allow: int, prefix).

    Flat wildcard-agent profile: every Allow/Disallow line applies
    (the pre-flattened snapshot shape crawl post-filters consume;
    per-agent sectioning is an upstream concern).  Split + regexp
    stay JVM-side; only rule lines explode (a handful per host).
    """
    line = F.explode(F.split(F.col(txt_col), "\n")).alias("line")
    return (
        robots.select(F.col(host_col).alias("host"), line)
        .select(
            "host",
            (F.regexp_extract("line", ROBOTS_LINE_RE, 1) == "Allow")
            .cast("int").alias("allow"),
            F.regexp_extract("line", ROBOTS_LINE_RE, 2).alias("prefix"))
        .filter(F.col("prefix") != "")
    )


def robots_verdicts(urls: DataFrame, robots: DataFrame) -> DataFrame:
    """Per-URL robots verdict → (url, host, blocked, rule).

    Google longest-match semantics: the most specific (longest)
    matching prefix decides; a length tie goes to Allow; residual
    ties break on the lexicographically greatest prefix (total order
    — same winner on any engine/partitioning).  URLs with no matching
    rule default to allowed with a NULL rule.

    Scale shape: rules join the URL table keyed by host (rule tables
    are a handful of rows per host — AQE broadcasts the parsed rule
    side; a true web-scale rule table still joins fine, it is
    host-partitioned like the URLs).  The prefix match filters
    POST-join, the winner is one per-URL window over matched rules
    only (≤ rules-per-host rows per URL), and the final verdict
    re-attaches by a url-keyed left join.
    """
    rules = robots_rules(robots)
    matched = (
        urls.select("url", "host", "path")
        .join(rules, "host")
        .filter(F.col("path").startswith(F.col("prefix")))
    )
    w = Window.partitionBy("url").orderBy(
        F.length("prefix").desc(), F.col("allow").desc(),
        F.col("prefix").desc())
    winner = (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("url", (F.col("allow") == 0).alias("blocked"),
                F.col("prefix").alias("rule"))
    )
    return (
        urls.select("url", "host")
        .join(winner, "url", "left")
        .select("url", "host",
                F.coalesce("blocked", F.lit(False)).alias("blocked"),
                "rule")
    )


def sql_robots_verdicts(urls_rel: str, robots_rel: str) -> str:
    """DuckDB twin of robots_verdicts over the same relations
    (urls_rel: url/host/path; robots_rel: host/robots_txt)."""
    return f"""
WITH rules AS (
  SELECT host,
         (regexp_extract(line, '{ROBOTS_LINE_RE}', 1) = 'Allow')::INT
           AS allow,
         regexp_extract(line, '{ROBOTS_LINE_RE}', 2) AS prefix
  FROM (SELECT host, unnest(string_split(robots_txt, chr(10))) AS line
        FROM {robots_rel})
  WHERE regexp_extract(line, '{ROBOTS_LINE_RE}', 2) <> ''
), matched AS (
  SELECT u.url, r.allow, r.prefix,
         row_number() OVER (PARTITION BY u.url
                            ORDER BY length(r.prefix) DESC,
                                     r.allow DESC, r.prefix DESC)
           AS rn
  FROM {urls_rel} u JOIN rules r ON u.host = r.host
  WHERE starts_with(u.path, r.prefix)
)
SELECT u.url, u.host,
       coalesce(m.allow = 0, FALSE) AS blocked,
       m.prefix AS rule
FROM {urls_rel} u
LEFT JOIN (SELECT url, allow, prefix FROM matched WHERE rn = 1) m
  USING (url)
"""


# ---------------------------------------------------------------------------
# crawl-budget apportionment: largest-remainder (Hamilton) method
# ---------------------------------------------------------------------------

def crawl_budget(urls: DataFrame, budget: int,
                 domain_col: str = "registered_domain") -> DataFrame:
    """Apportion an integer crawl ``budget`` across registered
    domains proportional to their page counts → (domain, pages,
    quota), Σ quota = min(budget, Σ... ) = budget exactly.

    Hamilton / largest-remainder, ALL-INTEGER: base quota =
    floor(budget·w/W); the leftover seats go to the largest
    remainders budget·w - base·W (ties: larger w first, then lexical
    domain — a total order, so the same seats on any engine).  Fair
    proportional allocation is the standard recrawl-scheduling
    primitive (politeness budgets per site per cycle).

    Scale shape: ONE corpus-wide map-side-combined count keyed by
    domain; everything after runs on the DOMAIN table (vocabulary-
    scale, 10^6-10^7 rows at web scale) — the rank-remainders window
    is a single global sort of that small table, never the corpus.
    """
    w = (urls.groupBy(F.col(domain_col).alias("domain"))
         .agg(F.count(F.lit(1)).alias("pages")))
    tot = w.agg(F.sum("pages").alias("W")).select(
        "W", F.lit(1).alias("__j"))
    scored = (
        w.withColumn("__j", F.lit(1)).join(F.broadcast(tot), "__j")
        .select(
            "domain", "pages", "W",
            F.expr(f"CAST({budget} AS BIGINT) * pages DIV W")
            .alias("base"),
            (F.lit(budget).cast("bigint") * F.col("pages")
             - F.expr(f"CAST({budget} AS BIGINT) * pages DIV W")
             * F.col("W")).alias("rem"))
    )
    rank = Window.orderBy(F.col("rem").desc(), F.col("pages").desc(),
                          F.col("domain").asc())
    leftover = (F.lit(budget).cast("bigint")
                - F.sum("base").over(Window.partitionBy()))
    return (
        scored.withColumn("rk", F.row_number().over(rank))
        .withColumn("__left", leftover)
        .select("domain", "pages",
                (F.col("base")
                 + (F.col("rk") <= F.col("__left")).cast("bigint"))
                .alias("quota"))
    )


def sql_crawl_budget(urls_rel: str, budget: int,
                     domain_col: str = "registered_domain") -> str:
    """DuckDB twin of crawl_budget (same floors, same tie order)."""
    return f"""
WITH w AS (
  SELECT {domain_col} AS domain, count(*)::BIGINT AS pages
  FROM {urls_rel} GROUP BY {domain_col}
), scored AS (
  -- sums pinned to BIGINT: DuckDB's sum() promotes to HUGEINT and
  -- drags quota into a non-BIGINT type the Spark twin never produces
  SELECT domain, pages,
         {budget}::BIGINT * pages
           // (SELECT sum(pages)::BIGINT FROM w) AS base,
         {budget}::BIGINT * pages
           - ({budget}::BIGINT * pages
              // (SELECT sum(pages)::BIGINT FROM w))
             * (SELECT sum(pages)::BIGINT FROM w) AS rem
  FROM w
)
SELECT domain, pages,
       (base + (row_number() OVER (ORDER BY rem DESC, pages DESC,
                                   domain ASC)
                <= {budget}::BIGINT
                   - (SELECT sum(base)::BIGINT FROM scored))::BIGINT
       )::BIGINT AS quota
FROM scored
"""


# ---------------------------------------------------------------------------
# rendezvous (highest-random-weight) shard assignment
# ---------------------------------------------------------------------------

def rendezvous_shard(key: Column, shards: list[str]) -> Column:
    """Deterministic shard for ``key`` by rendezvous hashing: the
    shard whose md5(key ':' shard) is greatest wins.

    The property exact/mod-N hashing lacks: REMOVING a shard remaps
    ONLY that shard's keys (each surviving shard keeps its win), so a
    storage-node change at 100 TB moves 1/N of the data instead of
    (N-1)/N.  In-row argmax over a literal shard array — zero
    shuffle, codegen'd; ties are impossible in practice but the
    struct max breaks them by shard name (total order).
    """
    scored = F.array(*[
        F.struct(
            F.md5(F.concat(key, F.lit(":"), F.lit(s))).alias("h"),
            F.lit(s).alias("shard"))
        for s in sorted(shards)])
    return F.array_max(scored)["shard"]


def shard_assignment(df: DataFrame, shards: list[str],
                     key_col: str = "url") -> DataFrame:
    """Per-shard placement rollup → (shard, n_keys): the audit table
    of a rendezvous-hash data placement.  Assignment is a zero-
    shuffle projection; only the |shards|-key rollup aggregates."""
    return (
        df.select(rendezvous_shard(F.col(key_col), shards)
                  .alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def sql_shard_assignment(rel: str, shards: list[str],
                         key_col: str = "url") -> str:
    """DuckDB twin of shard_assignment (same md5 tournament, via
    unnest + per-key argmax window)."""
    vals = ", ".join(f"('{s}')" for s in sorted(shards))
    # the tournament runs once per DISTINCT key (duplicate key values
    # would otherwise collapse inside the per-key window) and each
    # key's ROW COUNT re-attaches, matching the Spark per-row rollup
    return f"""
WITH keys AS (
  SELECT {key_col} AS k, count(*)::BIGINT AS c
  FROM {rel} GROUP BY {key_col}
), scored AS (
  SELECT k, c, s.shard,
         row_number() OVER (PARTITION BY k
                            ORDER BY md5(k || ':' || s.shard) DESC,
                                     s.shard DESC) AS rn
  FROM keys CROSS JOIN (SELECT * FROM (VALUES {vals}) v(shard)) s
)
SELECT shard, sum(c)::BIGINT AS n_keys
FROM scored WHERE rn = 1
GROUP BY shard
"""


def url_templates(df: DataFrame, url_col: str = "url",
                  host_col: str = "host",
                  path_col: str = "path") -> DataFrame:
    """URL path-template mining → (template, n_urls, n_hosts,
    example_url): collapse every digit run in the path to ``{n}``
    and aggregate.

    The crawl-engineering primitive behind pattern-level dedup and
    frontier shaping: ``/p/3/item-88`` and ``/p/7/item-123`` are the
    same page TEMPLATE (``/p/{n}/item-{n}``), and a template whose
    instance count explodes is a calendar/session-id trap a crawler
    must cap — the pattern-level view ``web_crawl_budget`` acts on.

    Scale shape: the template is one in-row regexp_replace (whole-
    stage codegen, the url never shuffles in full — only template +
    host leave the row), then ONE map-side-combined groupBy template
    with an exact distinct-host count (templates are pattern-scale,
    distinct hosts per template bounded by the host universe).
    """
    t = df.select(
        F.regexp_replace(F.col(path_col), "[0-9]+", "{n}")
        .alias("template"),
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"))
    return (t.groupBy("template")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct("host").alias("n_hosts"),
                 F.min("url").alias("example_url")))


def sql_url_templates(pages: str) -> str:
    """DuckDB twin over a ``(url)`` relation: same host/path parse
    as with_url_parts, same global digit-run collapse ('g' flag —
    DuckDB replaces first-match-only by default; Spark replaces all
    by default)."""
    return f"""
WITH parts AS (
  SELECT url,
         lower(regexp_extract(url, '{HOST_RE}', 1)) AS host,
         coalesce(regexp_extract(url, '{PATH_RE}', 1), '') AS path
  FROM ({pages})
)
SELECT regexp_replace(path, '[0-9]+', '{{n}}', 'g') AS template,
       count(*)::BIGINT AS n_urls,
       count(DISTINCT host)::BIGINT AS n_hosts,
       min(url) AS example_url
FROM parts
GROUP BY 1
"""


def anchor_priors(df: DataFrame, html_col: str = "html",
                  min_total: int = 2) -> DataFrame:
    """Anchor-text → destination priors → (anchor, dst_host, cnt,
    n_total, prior_x10k, rank): P(destination | anchor surface form),
    the classic link-prior an entity linker consults before any
    context model (the web's own disambiguation votes — "apple"
    overwhelmingly links to one host).

    The inverse direction of :func:`anchor_stats` (which profiles a
    HOST by its inlink anchors; this profiles a SURFACE FORM by its
    destinations).  Exact x10k integer priors; ``rank`` orders
    destinations per anchor by (cnt desc, dst_host) — rank 1 is the
    dictionary row a fast linker broadcasts.

    Scale shape: html consumed in-row (only (anchor, dst_host) pairs
    leave the scan), one map-side-combined pair count, an anchor-
    keyed marginal re-attached by a vocabulary-scale join, and a
    per-anchor window bounded by that anchor's DISTINCT destination
    count (never the corpus).  Anchors below ``min_total`` total
    occurrences are pruned — the long tail carries no prior signal
    and would dominate the output row count.
    """
    links = F.regexp_extract_all(
        F.col(html_col), F.lit(ANCHOR_TEXT_RE), F.lit(1))
    anchors = F.regexp_extract_all(
        F.col(html_col), F.lit(ANCHOR_TEXT_RE), F.lit(2))
    pairs = (
        df.select(F.explode(F.zip_with(
            links, anchors,
            lambda l, a: F.struct(l.alias("link"), a.alias("anchor"))
        )).alias("z"))
        .select(
            F.lower(F.trim(F.col("z.anchor"))).alias("anchor"),
            F.lower(F.regexp_extract("z.link", HOST_RE, 1))
            .alias("dst_host"))
        .filter(F.col("anchor") != "")
    )
    per_pair = (pairs.groupBy("anchor", "dst_host")
                .agg(F.count(F.lit(1)).alias("cnt")))
    marginal = (per_pair.groupBy("anchor")
                .agg(F.sum("cnt").alias("n_total"))
                .filter(F.col("n_total") >= min_total))
    w = Window.partitionBy("anchor").orderBy(
        F.col("cnt").desc(), F.col("dst_host"))
    return (
        per_pair.join(marginal, "anchor")
        .select("anchor", "dst_host", "cnt", "n_total",
                F.expr("(10000 * cnt) div n_total")
                .alias("prior_x10k"))
        .withColumn("rank",
                    F.row_number().over(w).cast("int"))
    )


def sql_anchor_priors(pages: str, html_col: str = "html",
                      min_total: int = 2) -> str:
    """DuckDB twin of :func:`anchor_priors`."""
    return f"""
WITH pairs AS (
  SELECT lower(trim(anchor)) AS anchor,
         lower(regexp_extract(link, '{HOST_RE}', 1)) AS dst_host
  FROM (
    SELECT
      unnest(regexp_extract_all({html_col}, '{ANCHOR_TEXT_RE}', 1))
        AS link,
      unnest(regexp_extract_all({html_col}, '{ANCHOR_TEXT_RE}', 2))
        AS anchor
    FROM ({pages})
  )
  WHERE lower(trim(anchor)) <> ''
), per_pair AS (
  SELECT anchor, dst_host, count(*)::BIGINT AS cnt
  FROM pairs GROUP BY anchor, dst_host
), marginal AS (
  SELECT anchor, sum(cnt)::BIGINT AS n_total
  FROM per_pair GROUP BY anchor
  HAVING sum(cnt) >= {min_total}
)
SELECT p.anchor, p.dst_host, p.cnt, m.n_total,
       ((10000 * p.cnt) // m.n_total)::BIGINT AS prior_x10k,
       row_number() OVER (PARTITION BY p.anchor
                          ORDER BY p.cnt DESC, p.dst_host)::INT
         AS rank
FROM per_pair p JOIN marginal m USING (anchor)
"""


def resolve_redirects(redirects: DataFrame,
                      max_doublings: int = 6) -> DataFrame:
    """Redirect-chain resolution → (src_url, final_url, hops,
    is_loop): follow every chain to its terminal target by POINTER
    DOUBLING (m ← m∘m), so a length-d chain resolves in ⌈log2 d⌉
    rounds, not d.

    The crawl-canonicalization step between fetch and dedup: a
    Common-Crawl-scale frontier carries millions of 301/302 chains,
    and the content key is the TERMINAL url.  ``is_loop`` marks
    sources whose chain never terminates (redirect cycles — real
    crawls have them; they are data, not an error, so the kernel
    marks rather than raises).  After ``max_doublings`` rounds
    chains up to 2^max_doublings hops are fully resolved;
    longer-but-acyclic chains would also surface as is_loop, so the
    default covers 64 hops — far past any crawler's follow limit
    (curl defaults to 50).

    Scale shape per round: ONE self-equi-join of the (src, cur)
    map on cur = src (both sides skinny url pairs) + a coalesce —
    lineage truncated per round; hop counts ADD under composition so
    the final count is exact.

    The input is first collapsed to a FUNCTIONAL map (one dst per
    src, ties broken by min(dst_url)), so duplicate src_url rows —
    a crawler re-fetching the same redirect — neither multiply rows
    through the doubling join nor diverge from the DuckDB twin,
    which applies the same min-per-src collapse.
    """
    m = (redirects.groupBy(F.col("src_url").alias("src"))
         .agg(F.min("dst_url").alias("cur"))
         .withColumn("hops", F.lit(1).cast("bigint"))
         .localCheckpoint())
    for _ in range(max_doublings):
        nxt = m.select(F.col("src").alias("cur"),
                       F.col("cur").alias("nxt"),
                       F.col("hops").alias("h2"))
        m = (m.join(nxt, "cur", "left")
             .select("src",
                     F.coalesce("nxt", F.col("cur")).alias("cur"),
                     (F.col("hops") + F.coalesce("h2", F.lit(0)))
                     .alias("hops"))
             .localCheckpoint())
    srcs = m.select(F.col("src").alias("cur")).distinct()
    return (m.join(srcs.withColumn("_is_src", F.lit(1)), "cur", "left")
            .select(F.col("src").alias("src_url"),
                    F.col("cur").alias("final_url"),
                    "hops",
                    F.col("_is_src").isNotNull().alias("is_loop")))


def sql_resolve_redirects(redirects_sql: str,
                          max_doublings: int = 6) -> str:
    """DuckDB twin: bounded recursive follow (hops < 2^max_doublings)
    + terminal/loop classification.  A cycle's walk stops at the hop
    bound; the Spark side's doubled map composes to exactly the same
    hop count because both walk the same bounded number of steps.
    Mirrors the kernel's min-per-src functional collapse so
    duplicate src_url rows resolve identically in both engines.
    """
    limit = 2 ** max_doublings
    return f"""
WITH RECURSIVE r AS (
  SELECT src_url AS src, min(dst_url) AS dst FROM ({redirects_sql})
  GROUP BY src_url
), walk(src, cur, hops) AS (
  SELECT src, dst, 1::BIGINT FROM r
  UNION ALL
  SELECT w.src, r.dst, w.hops + 1
  FROM walk w JOIN r ON r.src = w.cur
  WHERE w.hops < {limit}
), final AS (
  SELECT src, cur, hops,
         row_number() OVER (PARTITION BY src
                            ORDER BY hops DESC) AS rn
  FROM walk
)
SELECT f.src AS src_url, f.cur AS final_url, f.hops,
       EXISTS (SELECT 1 FROM r WHERE r.src = f.cur) AS is_loop
FROM final f WHERE f.rn = 1
"""
