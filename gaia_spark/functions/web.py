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

from pyspark.sql import Column, DataFrame
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
        F.lit('</p><a href="'), a1, F.lit('">a</a>'),
        F.when(doc_id % 3 == 0,
               F.concat(F.lit('<a href="'), a2, F.lit('">b</a>')))
        .otherwise(F.lit("")),
        F.lit("</body></html>"),
    )


def sql_synth_html(doc_id: str = "doc_id", source: str = "source",
                   text: str = "text") -> str:
    a1 = sql_synth_url(f"(({doc_id} * 31 + 1) % 1000)", source)
    a2 = sql_synth_url(f"(({doc_id} * 17 + 2) % 1000)", source)
    return (
        f"'<html><body><p>' || substr({text}, 1, 120)"
        f" || '</p><a href=\"' || {a1} || '\">a</a>'"
        f" || CASE WHEN {doc_id} % 3 = 0 THEN"
        f" '<a href=\"' || {a2} || '\">b</a>' ELSE '' END"
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
