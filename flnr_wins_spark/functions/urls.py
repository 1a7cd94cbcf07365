"""URL parsing + domain blocklist filtering for web-corpus curation.

Crawl-scale corpora filter documents by the registered domain of their source
URL (spam/adult/boilerplate domain lists). This runs once per document of a
100 TB crawl, so everything stays JVM-side in whole-stage codegen: host
extraction is one ``regexp_extract``, domain derivation is array ops, and the
blocklist — thousands to low millions of domains, always tiny next to the
corpus — joins as a broadcast hash join (no corpus shuffle).

Registered-domain extraction uses the last-two-labels heuristic. A faithful
implementation needs the public-suffix list (``co.uk`` etc.), which is a data
file, not an algorithm: at production, attach the PSL as a broadcast dimension
and resolve via longest-suffix match; the operator shape is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme '://' [userinfo '@'] host — host ends at path/port/query/fragment
HOST_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def url_host(url: Column) -> Column:
    """Lower-cased host of ``url``; '' when the URL has no scheme://host."""
    return F.lower(F.regexp_extract(url, HOST_PATTERN, 1))


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of a host ('www.a.example.org' -> 'example.org');
    hosts with fewer than two labels pass through unchanged."""
    labels = F.split(host, r"\.")
    return F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)


def with_url_parts(
    df: DataFrame, url_col: str, host_col: str = "host", domain_col: str = "domain"
) -> DataFrame:
    """Project host + registered domain columns from a URL column (narrow)."""
    host = url_host(F.col(url_col))
    return df.withColumn(host_col, host).withColumn(domain_col, registered_domain(F.col(host_col)))


# tracking parameters stripped by canonical_url (prefix match for utm_*)
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("gclid", "fbclid", "ref", "mc_cid", "mc_eid")


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for crawl dedup/grouping. Rules (all pure
    regex/array expressions, RE2-compatible so a DuckDB oracle mirrors them
    exactly):

      1. scheme + host lower-cased; leading ``www.`` dropped from the host;
      2. default ports dropped (``:80`` for http, ``:443`` for https),
         other ports kept;
      3. fragment dropped;
      4. tracking query params dropped (``utm_*``, gclid, fbclid, ref,
         mc_cid, mc_eid), the rest SORTED so param order never splits a
         group; empty query drops the ``?``;
      5. empty path becomes ``/``; a trailing slash on a longer path is
         stripped (``/a/`` == ``/a``).

    URLs without a scheme://host pass through unchanged (nothing to
    canonicalize against).
    """
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    )
    host_c = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#]+:([0-9]+)", 1
    )
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # empty path -> '/'; one trailing slash stripped from non-root paths
    path_c = F.when(path == "", "/").otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            path.substr(F.lit(1), F.length(path) - 1),
        ).otherwise(path)
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.regexp_extract(p, "^([^=]*)", 1).startswith("utm_")
        & ~F.regexp_extract(p, "^([^=]*)", 1).isin(list(TRACKING_PARAMS)),
    )
    query_c = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host_c,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path_c,
        F.when(query_c != "", F.concat(F.lit("?"), query_c)).otherwise(F.lit("")),
    )
    return F.when(host == "", url).otherwise(rebuilt)


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame | Iterable[str],
    mode: str = "kept",
) -> DataFrame:
    """Split a corpus on a domain blocklist.

    ``blocked`` is a one-column DataFrame of domains or a plain iterable of
    strings (normalized to lower case). ``mode='kept'`` returns documents
    whose registered domain is NOT blocked (broadcast anti join);
    ``mode='rejected'`` returns the blocked ones (broadcast semi join) —
    the same kept/rejected split shape as ``operators.reject`` (reference
    QA rejection, SURVEY.md R8).
    """
    if mode not in ("kept", "rejected"):
        raise ValueError(f"mode must be 'kept' or 'rejected', got {mode!r}")
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        from flnr_wins_spark.localrel import local_df

        blocked = local_df(spark, [(d,) for d in blocked], "domain string")
    bl = F.broadcast(blocked.select(F.lower(F.col(blocked.columns[0])).alias("domain")).distinct())
    parts = with_url_parts(df, url_col)
    how = "left_anti" if mode == "kept" else "left_semi"
    return parts.join(bl, "domain", how)
