"""Web-document hygiene: boilerplate stripping and URL anatomy.

Standard web-corpus curation steps (the C4/RefinedWeb line-level
cleanup family) absent from the reference SDK; all pure Catalyst
expressions — JVM regex in the scan stage, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: line-level boilerplate: navigation chrome, legal footers,
#: engagement bait. (?i) works identically in Java regex and RE2.
BOILERPLATE_RE = (
    r"(?i)^(copyright\b|all rights reserved|terms of (use|service)"
    r"|privacy policy|cookie|subscribe\b|sign (in|up)\b|log ?in\b"
    r"|share this|follow us|advertisement$)"
)


def strip_boilerplate(
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    min_line_chars: int = 10,
    pattern: str = BOILERPLATE_RE,
) -> DataFrame:
    """Remove boilerplate and too-short lines, keep the rest verbatim.

    One array pipeline per row: split on newline → filter (length +
    regex) → rejoin. Output: (id, n_lines, n_kept, cleaned).
    """
    text = F.coalesce(F.col(text_column), F.lit(""))
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda l: (F.length(F.trim(l)) >= min_line_chars)
        & ~F.trim(l).rlike(pattern),
    )
    return df.select(
        F.col(id_column),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.array_join(kept, "\n").alias("cleaned"),
    )


def url_host(url: Column) -> Column:
    """Hostname of a URL (empty string when unparseable)."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of the host — the eTLD+1 approximation that
    needs no suffix list (documented limitation: multi-label public
    suffixes like co.uk collapse)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def path_depth(url: Column) -> Column:
    """Number of non-empty path segments after the authority."""
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    return F.size(F.filter(F.split(path, "/"), lambda s: s != "")).cast("bigint")


def url_profile(
    df: DataFrame,
    url_column: str = "url",
    id_column: str = "doc_id",
) -> DataFrame:
    """Per-URL anatomy row: (id, host, domain, depth). A single
    projection; per-domain caps/stats compose with
    operators/mixture.py cap_per_source on the ``domain`` column."""
    u = F.col(url_column)
    host = url_host(u)
    return df.select(
        F.col(id_column),
        host.alias("host"),
        registered_domain(host).alias("domain"),
        path_depth(u).alias("depth"),
    )


#: Tracking parameters stripped by canonical_url — the fixed, stated
#: list (utm family + the big ad-click ids). A fixed list is the
#: deterministic contract; extend per deployment.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref)="


def canonical_url(
    df: DataFrame,
    url_column: str = "url",
    id_column: str = "doc_id",
) -> DataFrame:
    """URL canonicalization — the dedup key normalizer every CC-style
    crawl pipeline runs before exact URL dedup (the same page arrives
    as http://Site.com/a/?utm_source=x#frag and https://site.com/a):

    - scheme and host lowercase; default ports (:80 http, :443 https)
      stripped; fragment dropped
    - trailing path slashes stripped (empty path -> '/'); stated: no
      percent-decoding or dot-segment resolution (both can change
      semantics — leave them to a fetcher)
    - query: tracking params dropped (TRACKING_PARAM_RE — fixed list),
      empties dropped, the REST SORTED lexicographically and rejoined
      ('?' disappears when nothing survives)

    One projection — regex + HOF arithmetic, zero joins/shuffles,
    stream-safe, identical semantics in Java regex and RE2. Rows
    without a scheme://host shape pass through unchanged with
    is_url = false (never silently rewritten).

    Output: (id, canonical string, is_url boolean).
    """
    # NULL url -> is_url FALSE (not NULL), canonical '' — regexp over
    # NULL would otherwise propagate NULL through every derived column
    u = F.coalesce(F.col(url_column), F.lit(""))
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    host = (
        F.when(
            (scheme == "http"), F.regexp_replace(hostport, ":80$", "")
        )
        .when((scheme == "https"), F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    is_url = (scheme != "") & (hostport != "")
    canon = F.concat(scheme, F.lit("://"), host, path, qtail)
    return df.select(
        F.col(id_column).alias("id"),
        F.when(is_url, canon)
        .otherwise(F.coalesce(u, F.lit("")))
        .alias("canonical"),
        is_url.alias("is_url"),
    )
