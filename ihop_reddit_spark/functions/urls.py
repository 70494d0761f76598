"""URL canonicalization for crawl-frontier and document dedup — the
"same page, different URL string" problem every web corpus hits before
content dedup even starts (scheme/host case, default ports, fragments,
tracking parameters, unordered query strings).

Entirely JVM-side column expressions (regexp_extract / array ops —
codegen-fused, zero shuffle, zero Python), restricted to the Java-regex
∩ RE2 subset and to array semantics DuckDB mirrors (`array_sort` ↔
`list_sort` binary collation), so normalization is oracle-checkable
hash-exact.

Scope (documented contract): absolute http(s) URLs. The column
expressions cover the variants that dominate crawl-frontier duplicates;
:func:`normalize_url_exact` is the urllib-backed Pandas-UDF twin adding
punycode/IDN hosts and RFC 3986 percent-encoding normalization (equal to
the JVM twin on ASCII escape-free URLs — property-pinned, and hash-pinned
cross-engine with planted IDN/percent variants by the
``normalized_url_groups`` oracle). FOR NON-ASCII CORPORA USE THE EXACT
PATH: pass ``exact_urls=True`` to ``plans.crawl_corpus`` (or call
:func:`normalize_url_exact` directly) — the Catalyst default dedups
non-ASCII hosts imperfectly (no punycode), which on an international
crawl means missed frontier duplicates, not errors. Path-segment
resolution (``/a/../b``) remains out of scope for both (rare in frontier
data and ambiguous without fetch semantics).
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


#: shared with the exact twin below — one definition, both engines/paths
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _pct_normalize(s: str) -> str:
    """RFC 3986 §6.2.2 percent-encoding normalization: decode escapes of
    UNRESERVED characters (%7E → ~), uppercase the hex of all others
    (%3a → %3A). Reserved characters stay encoded — decoding them would
    change which syntax the bytes are (``%2F`` is data, ``/`` is a
    delimiter). Malformed escapes pass through untouched."""
    import re

    def fix(m):
        code = int(m.group(1), 16)
        ch = chr(code)
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return re.sub(r"%([0-9A-Fa-f]{2})", fix, s)


def _normalize_url_py(u):
    """Pure-Python twin of :func:`normalize_url` plus the two
    normalizations column expressions can't express (module docstring's
    documented deployment swap): IDN hosts → punycode via the ``idna``
    codec, and RFC 3986 percent-encoding normalization on path and
    query. Same output as the Catalyst version on ASCII escape-free
    http(s) URLs (property-pinned in tests)."""
    import re
    from urllib.parse import urlsplit

    if u is None:
        return None
    try:
        parts = urlsplit(u)
        if not parts.scheme or "://" not in u:
            raise ValueError("not an absolute URL")
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        if host:
            try:
                host = host.encode("idna").decode("ascii")
            except UnicodeError:
                pass  # IP literals / oversized labels: keep lowercased
        port = parts.port
        port_kept = (
            ""
            if port is None
            or (scheme == "http" and port == 80)
            or (scheme == "https" and port == 443)
            else f":{port}"
        )
        path = _pct_normalize(parts.path) or "/"
        if len(path) > 1 and path.endswith("/"):
            path = path[:-1]
        track = re.compile(TRACKING_PARAM_REGEX)
        params = sorted(
            _pct_normalize(kv)
            for kv in parts.query.split("&")
            if kv and not track.match(kv)
        )
        query = "&".join(params)
        return (
            f"{scheme}://{host}{port_kept}{path}"
            + (f"?{query}" if query else "")
        )
    except ValueError:
        # garbage in, garbage out — never an error, like the JVM twin
        return u


def normalize_url_exact(url: Column) -> Column:
    """urllib-backed EXACT canonicalizer behind the same signature as
    :func:`normalize_url`: everything the JVM twin does, plus punycode
    (IDN) host encoding and percent-encoding normalization — the
    mixed-encoding aliases a real crawl hits daily (``münchen.de`` ==
    ``xn--mnchen-3ya.de``, ``%7Euser`` == ``~user``).

    Arrow-batched scalar Pandas UDF (never row-at-a-time); use it where
    encoding fidelity matters more than staying JVM-side —
    ``crawl_corpus(exact_urls=True)``. The Catalyst twin remains the
    default and the DuckDB-oracle anchor (hash gates need both engines
    computing the same expression)."""
    import pandas
    from pyspark.sql.functions import pandas_udf

    # real type objects (not string annotations) so Spark's type-hint
    # inference resolves them regardless of this module's globals
    def _norm(s):
        return s.map(_normalize_url_py)

    _norm.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return pandas_udf("string")(_norm)(url)


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
