"""URL canonicalization for web-crawl tables — pure Catalyst, no UDFs.

Common-Crawl-style corpora key everything on ``url`` (BASELINE.json
``input_hint``), and the cheapest dedup tier in a web pipeline is URL-level:
collapse captures of the same logical page *before* any content hashing or
MinHash work. That requires a canonical form — the raw WARC-Target-URI differs
across captures in scheme case, host case, ``www.`` prefixes, default ports,
tracking query parameters, parameter order, trailing slashes, and fragments,
none of which change the fetched resource.

Everything here compiles to built-in Catalyst expressions (``regexp_extract``,
``filter``, ``array_sort``, string ops), so canonicalization runs inside
whole-stage codegen on the scan projection — at 10^12 rows it is a free map,
never a shuffle and never a Python round-trip. The reference has no URL layer
(its ids are forum question ids); this is a forward-path operator for the
web-page input shape.

Canonical form (applied in order):

1. scheme lowercased;
2. authority lowercased; a leading ``www.`` dropped; a scheme-default port
   (``http:80`` / ``https:443``) dropped, any other explicit port kept;
3. path: trailing ``/`` runs stripped (``/a/`` == ``/a``, and the root ``/``
   collapses to the empty path);
4. query: split on ``&``, empty pairs and tracking parameters dropped
   (``utm_*`` prefix plus the exact set in ``TRACKING_PARAMS``), survivors
   byte-sorted and re-joined — parameter order never distinguishes captures;
5. fragment dropped.

Non-http(s)-looking strings (no ``scheme://`` prefix) pass through unchanged
rather than turning into garbage — a crawl table always carries some junk rows
and the canonicalizer must be total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# exact-match tracking parameter names, dropped alongside the utm_* prefix
# family (click ids and mail-campaign ids from the major ad/mail platforms)
TRACKING_PARAMS = (
    "gclid", "fbclid", "msclkid", "yclid", "igshid", "mc_cid", "mc_eid",
)

# one regex per URL part, anchored so each part is extracted independently of
# the others' presence; kept RE2-simple so Spark (Java regex) and any SQL
# oracle (RE2) agree byte-for-byte on ASCII input
_SCHEME_RE = "^([^:/?#]+)://"
_AUTH_RE = "^[^:/?#]+://([^/?#]*)"
_PATH_RE = "^[^:/?#]+://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host with any ``www.`` prefix and ``:port`` suffix removed."""
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    return F.regexp_replace(
        F.regexp_replace(auth, "^www\\.", ""), ":[0-9]*$", ""
    )


def url_port(url: Column) -> Column:
    """Explicit port as a string, '' when absent."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    return F.regexp_extract(auth, ":([0-9]+)$", 1)


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, _QUERY_RE, 1)


def _canonical_query(url: Column) -> Column:
    """Tracking-stripped, byte-sorted query string ('' when nothing survives)."""
    pairs = F.split(url_query(url), "&")
    # query-param KEYS are matched case-insensitively (UTM_SOURCE / Gclid are
    # the same tracker — keys are case-preserved in the wild); the surviving
    # pairs themselves keep their original bytes, values stay case-sensitive
    key = lambda kv: F.lower(F.split(kv, "=").getItem(0))  # noqa: E731
    kept = F.filter(
        pairs,
        lambda kv: (kv != F.lit(""))
        & ~key(kv).startswith("utm_")
        & ~key(kv).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonical_url(url: Column) -> Column:
    """The canonical form described in the module docstring, as one Catalyst
    expression tree. Strings without a ``scheme://`` prefix pass through."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(url_path(url), "/+$", "")
    q = _canonical_query(url)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    rebuilt = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    return F.when(scheme == "", url).otherwise(rebuilt)


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def latest_capture_per_url(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tie_col: str | None = None,
) -> DataFrame:
    """URL-tier dedup: one row per canonical URL — the newest capture wins.

    This is the tier that runs BEFORE content dedup in a crawl pipeline:
    a single aggregation on ``canonical_url`` — ONE shuffle, partial
    (map-side) combine, no global window — keeping the latest ``ts_col`` and
    a capture count per logical page. (``max_by``'s struct buffer makes Spark
    pick SortAggregate over HashAggregate; the sort is per-partition and the
    partial combine still collapses duplicate captures before the exchange,
    which is what matters at crawl scale where captures of one URL are
    colocated in the same WARC segments.) ``tie_col`` breaks equal-timestamp ties
    deterministically (larger wins); it defaults to the raw URL so the result
    is reproducible on corpora with second-granularity WARC timestamps.

    Returns (canonical_url, n_captures, latest_ts, latest_<tie_col>).
    """
    tie = tie_col or url_col
    canon = with_canonical_url(df, url_col, "canonical_url")
    # max_by on a (ts, tie) struct = argmax with deterministic tie-break,
    # all inside one partial-aggregable hash agg
    pick = F.struct(F.col(ts_col), F.col(tie))
    return canon.groupBy("canonical_url").agg(
        F.count("*").alias("n_captures"),
        F.max(ts_col).alias("latest_ts"),
        F.max_by(F.col(tie), pick).alias(f"latest_{tie}"),
    )
