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

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
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


#: Public-suffix snapshot — a CURATED list in the spirit of
#: publicsuffix.org's ICANN section, NOT a strict subset of it (a few
#: entries, e.g. co.it and the com.ru/msk.ru/spb.ru family, are
#: historical/private-section suffixes kept because real corpora still
#: register under them; grouping there is finer than the live PSL, and
#: both engines share this tuple so there is no parity risk): the
#: multi-label public suffixes under which registrations actually
#: happen, so eTLD+1 grouping does not collapse entire ccTLD families
#: (every *.co.uk site is NOT one "domain"). Deliberately bounded to
#: the high-traffic 2- and 3-label suffixes a web corpus actually
#: hits; single-label TLDs need no entry (the default rule). Wildcard
#: PSL rules (*.ck) and most of the private section are out of
#: snapshot — stated limitation; extend per deployment.
#: Small enough to live as a literal IN-list (constant-folded by
#: Catalyst — zero joins, zero shuffles, stream-safe); a full 9k-entry
#: list would instead broadcast-join on the candidate suffix.
PSL_SNAPSHOT = (
    # .uk / .il / .nz / .za ...
    "co.uk", "org.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk",
    "ac.uk", "gov.uk", "sch.uk", "nhs.uk", "police.uk",
    "co.il", "org.il", "ac.il", "gov.il", "muni.il", "net.il",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    # .au
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "id.au",
    # .jp / .kr / .cn / .tw / .hk / .sg / .my / .id / .th / .vn
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "my.id",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "ac.vn",
    # .in / .pk / .bd / .lk / .np
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd",
    "com.lk", "org.lk", "edu.lk", "gov.lk", "ac.lk",
    "com.np", "org.np", "edu.np", "gov.np",
    # americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "blog.br", "eco.br", "emp.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "co.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo",
    "com.py", "net.py", "org.py", "edu.py", "gov.py",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "web.do",
    "com.sv", "com.ni", "com.pa", "com.pr", "com.jm", "com.tt",
    # europe / mideast / africa
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "gen.tr",
    "web.tr", "bel.tr", "k12.tr",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "co.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "publ.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.it", "gov.it", "edu.it",
    "com.ro", "org.ro", "nom.ro", "info.ro", "rec.ro",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "sch.ae",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "i.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz",
    "co.ug", "or.ug", "ne.ug", "go.ug", "ac.ug", "sc.ug",
    "com.gh", "edu.gh", "gov.gh", "org.gh",
    "com.et", "gov.et", "org.et", "edu.et",
    "co.zw", "org.zw", "gov.zw", "ac.zw",
    "co.mz", "gov.mz", "org.mz", "edu.mz",
    "co.bw", "org.bw",
    # misc high-traffic
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph",
    "com.kh", "net.kh", "org.kh", "edu.kh", "gov.kh", "per.kh",
    "com.mm", "net.mm", "org.mm", "edu.mm", "gov.mm",
    "com.la", "net.la", "org.la", "edu.la", "gov.la",
    "com.bn", "com.mt", "com.cy", "com.lb", "com.jo", "com.kw",
    "com.qa", "com.bh", "com.om", "com.ye", "com.af", "com.fj",
    # 3-label suffixes: the US locality scheme (k12/cc/lib.<state>.us)
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.il.us",
    "k12.pa.us", "k12.oh.us", "k12.mi.us", "k12.ga.us", "k12.nc.us",
    "k12.nj.us", "k12.va.us", "k12.wa.us", "k12.ma.us", "k12.az.us",
    "cc.ca.us", "cc.ny.us", "cc.tx.us", "lib.ca.us", "lib.ny.us",
    "lib.tx.us",
    # 4-label suffixes (the deepest the snapshot carries)
    "pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us",
)

#: the snapshot split by label count — the longest-match ladder only
#: ever probes the last 3 and last 2 labels
_PSL_3 = tuple(sorted(s for s in PSL_SNAPSHOT if s.count(".") == 2))
_PSL_2 = tuple(sorted(s for s in PSL_SNAPSHOT if s.count(".") == 1))
_PSL_4 = tuple(sorted(s for s in PSL_SNAPSHOT if s.count(".") == 3))


def _last_labels(labels: Column, n: Column, k: int) -> Column:
    """'.'-join of the last k labels (lowercased), '' when fewer than
    k labels exist — the guard keeps F.slice off its negative-start
    out-of-range edge."""
    return F.when(
        n >= k, F.lower(F.array_join(F.slice(labels, -k, k), "."))
    ).otherwise(F.lit(""))


def registered_domain(host: Column, *, use_psl: bool = True) -> Column:
    """eTLD+1 of a hostname via longest-suffix match against the
    bundled public-suffix snapshot (:data:`PSL_SNAPSHOT`): the public
    suffix is the longest matching 4-/3-/2-label tail, else the bare
    TLD (the PSL default rule ``*``), and the registered domain is
    that suffix plus one more label — so www.example.co.uk groups as
    example.co.uk, not the whole co.uk ccTLD family.

    Pure Catalyst: label split + literal array_contains probes
    (constant-folded IN-lists — zero joins/shuffles, stream-safe).
    Hosts that ARE a public suffix (or a bare TLD / single label)
    yield '' — there is no registered domain to group by, and
    returning the suffix would silently merge unrelated sites.

    ``use_psl=False`` keeps the historical no-list approximation
    (last two labels, multi-label suffixes collapse) as the documented
    fallback when no suffix list is wanted.
    """
    if not use_psl:
        return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    last2 = _last_labels(labels, n, 2)
    last3 = _last_labels(labels, n, 3)
    last4 = _last_labels(labels, n, 4)
    chain = None
    for klen, tier, lastk in (
        (4, _PSL_4, last4),
        (3, _PSL_3, last3),
        (2, _PSL_2, last2),
    ):
        if not tier:  # a trimmed snapshot may empty a tier
            continue
        cond = F.array_contains(F.array(*[F.lit(s) for s in tier]), lastk)
        chain = F.when(cond, klen) if chain is None else chain.when(cond, klen)
    suffix_len = F.lit(1) if chain is None else chain.otherwise(1)
    reg_len = suffix_len + 1
    return F.when(
        (F.trim(host) == "") | (n < reg_len) | F.array_contains(labels, ""),
        F.lit(""),
    ).otherwise(
        F.lower(
            F.array_join(
                F.slice(labels, -reg_len, reg_len), "."
            )
        )
    )


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

    from sutro_spark.operators.dedup import spread

    df = spread(df)  # parallelize the expression-heavy scan stage (r16)
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
    # the '?' must be found BEFORE the fragment: a lazy pre-fragment
    # scan ^[^#]*?\? — a bare \?([^#]*) would match a '?' living
    # INSIDE the fragment (http://a/b#x?y=1, hash-routed
    # https://app.com/#/route?id=3) and leak fragment content into
    # the canonical URL, corrupting dedup keys (r13 advice)
    query = F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1)
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
