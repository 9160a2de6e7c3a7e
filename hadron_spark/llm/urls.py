"""URL/domain-level corpus curation — the web-crawl stages every
Common Crawl-derived pipeline runs before text ever matters:
canonicalize URLs (so the exact-dedup key is stable across tracking
junk), extract the registered domain, cap documents per domain (the
C4/RefinedWeb anti-SEO-farm quota), and filter against domain
blocklists.

Everything here is a pure Catalyst expression or an equi-join — no
UDFs, no shuffle beyond the declared ones — and every op is exact
string/integer work, so the whole tier carries FULL DuckDB oracles
(q227/q228/q229).

Canonicalization semantics (`normalize_url`), chosen to be the
stable-dedup-key subset of RFC 3986 normalization:
  - scheme and host lowercased; default ports (:80 http, :443
    https) stripped, other ports kept;
  - fragment dropped (never reaches the server);
  - tracking params dropped (utm_* / fbclid / gclid / ref — the
    standard crawl-pipeline strip set), remaining params SORTED so
    param order doesn't split dup groups;
  - trailing slash dropped from non-root paths, root collapsed to
    no-path.
Semantic-preserving only for the dedup-key use case (param
reordering is not guaranteed harmless to every server — that is
true of every crawl canonicalizer; the point is a stable key).

`registered_domain` is public-suffix-LITE: an embedded table of the
common two-level public suffixes (co.uk, com.au, ...) → last three
labels, else last two.  The full PSL is a data file, not an
algorithm — swap `_TWO_LEVEL_SUFFIXES` for a broadcast of the real
list at production scale; the expression shape is unchanged.

No counterpart in the reference repo (beyond-reference LLM tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# common two-level public suffixes (public knowledge; see module
# docstring for the swap-in-the-real-PSL note)
_TWO_LEVEL_SUFFIXES = [
    "ac.uk", "co.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tw", "com.sg",
    "co.in", "co.kr", "co.za", "com.ar",
]

_TRACKING_KEYS = ["fbclid", "gclid", "ref"]

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def url_parts(url: Column | str) -> Column:
    """struct(scheme, host, port, path, query) parsed from an
    absolute URL — scheme/host lowercased, port '' when absent,
    query without the '?'.  Malformed URLs (no scheme://) yield a
    struct of empty strings (filter on scheme != '')."""
    u = F.col(url) if isinstance(url, str) else url
    hostport = F.regexp_extract(u, _URL_RE, 2)
    return F.struct(
        F.lower(F.regexp_extract(u, _URL_RE, 1)).alias("scheme"),
        F.lower(F.substring_index(hostport, ":", 1)).alias("host"),
        F.when(
            hostport.contains(":"), F.substring_index(hostport, ":", -1)
        ).otherwise(F.lit("")).alias("port"),
        F.regexp_extract(u, _URL_RE, 3).alias("path"),
        F.regexp_extract(u, _URL_RE, 4).alias("query"),
    )


def normalize_url(url: Column | str) -> Column:
    """Canonical dedup-key form of an absolute URL (see module
    docstring for the exact semantics).  One in-row expression —
    zero shuffle, fully DuckDB-mirrorable (q227)."""
    p = url_parts(url)
    scheme, host, port = p["scheme"], p["host"], p["port"]
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    hostport = F.when(
        (port == "") | default, host
    ).otherwise(F.concat(host, F.lit(":"), port))
    path = F.when(
        (p["path"] == "/") | (p["path"] == ""), F.lit("")
    ).otherwise(F.regexp_replace(p["path"], "/$", ""))
    keep = F.filter(
        F.split(p["query"], "&"),
        lambda kv: (kv != "")
        & ~F.lower(F.substring_index(kv, "=", 1)).startswith("utm_")
        & ~F.lower(F.substring_index(kv, "=", 1)).isin(_TRACKING_KEYS),
    )
    query = F.array_join(F.array_sort(keep), "&")
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            hostport,
            path,
            F.when(query == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), query)
            ),
        )
    )


def registered_domain(host: Column | str) -> Column:
    """Registrable domain of a hostname: last three labels when the
    last two form a known two-level public suffix, else last two
    (public-suffix-lite — swap the list for the real PSL at scale).
    Single-label hosts pass through."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    take = F.when(
        (n >= 3) & last2.isin(_TWO_LEVEL_SUFFIXES), F.lit(3)
    ).otherwise(F.least(n, F.lit(2)))
    return F.array_join(
        F.slice(labels, F.greatest(n - take + 1, F.lit(1)), take), "."
    )


def domain_quota_sample(
    df: DataFrame,
    domain_col: str,
    max_docs_per_domain: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap (the C4/RefinedWeb quota against SEO
    farms and mirror sites): keep at most `max_docs_per_domain`
    documents per domain, chosen by DETERMINISTIC hash priority —
    rank = row_number over (domain) ordered by (md5(id), id), keep
    rank <= cap.  A uniform within-domain sample that is identical
    on any partitioning/rerun (the upsample_repeats discipline), one
    domain-keyed exchange.  Hot domains are exactly what the cap
    exists for, and a windowed row_number over a skewed domain still
    funnels that domain through one task — at crawl scale pre-filter
    truly degenerate hosts (> ~10M pages) with a count first."""
    from pyspark.sql import Window

    if max_docs_per_domain < 1:
        raise ValueError(
            f"max_docs_per_domain must be >= 1: {max_docs_per_domain}"
        )
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_docs_per_domain)
        .drop("_rk")
    )


def blocklist_filter(
    df: DataFrame,
    host_col: str,
    blocked: "list[str] | DataFrame",
    domain_col_in_blocklist: str = "domain",
) -> DataFrame:
    """Drop rows whose host is a blocked domain or any subdomain of
    one.  Two shapes:
    - `blocked` a Python list (small curated lists): one in-row
      exists() expression, zero shuffle;
    - `blocked` a DataFrame (registry-scale lists): broadcast
      LEFT ANTI equi-join on `registered_domain(host)` — matches
      the blocklist at the registrable-domain level."""
    h = F.lower(F.col(host_col))
    if isinstance(blocked, DataFrame):
        bl = blocked.select(
            F.lower(F.col(domain_col_in_blocklist)).alias("_bl_dom")
        ).distinct()
        return (
            df.withColumn("_rd", registered_domain(h))
            .join(
                F.broadcast(bl),
                F.col("_rd") == F.col("_bl_dom"),
                "left_anti",
            )
            .drop("_rd")
        )
    arr = F.array(*[F.lit(b.lower()) for b in blocked])
    hit = F.exists(
        arr, lambda b: (h == b) | h.endswith(F.concat(F.lit("."), b))
    )
    return df.filter(~hit)
