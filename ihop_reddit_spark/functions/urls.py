"""URL canonicalization for crawl-frontier and document dedup — the
"same page, different URL string" problem every web corpus hits before
content dedup even starts (scheme/host case, default ports, fragments,
tracking parameters, unordered query strings).

Entirely JVM-side column expressions (regexp_extract / array ops —
codegen-fused, zero shuffle, zero Python), restricted to the Java-regex
∩ RE2 subset and to array semantics DuckDB mirrors (`array_sort` ↔
`list_sort` binary collation), so normalization is oracle-checkable
hash-exact.

Scope (documented contract): absolute http(s) URLs. Punycode/IDN,
percent-encoding normalization, and path-segment resolution (`/a/../b`)
need a real URL parser — the deployment swap is a Pandas-UDF
`urllib.parse` pass; the column expressions here cover the variants that
dominate crawl-frontier duplicates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that never affect page content — the usual tracking
#: families dropped by crawl canonicalizers.
TRACKING_PARAM_REGEX = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_eid)="


def _split_url(url: Column) -> dict[str, Column]:
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    return {
        "scheme": scheme, "host": host, "port": port,
        "path": path, "query": query,
    }


def normalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    * scheme and host lowercased;
    * fragment dropped;
    * default ports dropped (``http:80``, ``https:443``), others kept;
    * empty path becomes ``/``; a single trailing slash after a
      non-root path is dropped (``/a/`` == ``/a`` — the dominant
      alias; real servers that distinguish them are the exception);
    * tracking parameters removed (:data:`TRACKING_PARAM_REGEX`);
    * remaining query parameters sorted bytewise (order never affects
      the resource), empty query dropped.

    NULL-safe: non-URL strings normalize to themselves minus nothing —
    garbage in, garbage out, never an error.
    """
    p = _split_url(url)
    port_kept = F.when(
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
        | (p["port"] == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(
        F.regexp_replace(p["path"], r"(.)/$", "$1")
    )
    params = F.filter(
        F.split(p["query"], "&"),
        lambda kv: (kv != "")
        & ~kv.rlike(TRACKING_PARAM_REGEX),
    )
    query = F.concat_ws("&", F.array_sort(params))
    return F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        port_kept,
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )


def url_host(url: Column) -> Column:
    """Lowercased host — the partition/grouping key for per-site policies
    (crawl-rate limits, domain blocklists, per-site dedup)."""
    return _split_url(url)["host"]


def url_domain_key(url: Column) -> Column:
    """Last two host labels (``news.example.co`` → ``example.co``) — the
    cheap registrable-domain approximation used for per-domain quotas
    when no public-suffix list is loaded (the PSL swap is a broadcast
    join on the suffix table, same plan shape)."""
    return F.regexp_extract(
        _split_url(url)["host"], r"([^.]+\.[^.]+)$", 1
    )
