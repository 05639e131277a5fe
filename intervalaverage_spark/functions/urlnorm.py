"""URL canonicalization — pure-JVM expressions for the crawl key column.

The engine's input table is keyed by ``url`` (BASELINE.json input_hint):
every dedup/churn/recrawl operator upstream assumes one canonical key
per page, but crawlers emit the same page as ``HTTP://WWW.Example.COM:80/a/?utm_source=x&b=2&a=1#frag``
and ``http://example.com/a?a=1&b=2``. This module makes those collide —
with a PRECISELY DOCUMENTED, cross-engine-replayable rule set rather
than a kitchen-sink library (every rule below is mirrored 1:1 in the
driver's DuckDB oracle; regexes are kept in the Java∩RE2 common
subset):

1. scheme and host lowercase; URLs without a ``scheme://`` are NOT
   urls under this contract → NULL (callers keep the raw string);
2. userinfo (``user:pass@``) dropped;
3. a leading ``www.`` on the host dropped (``strip_www=False`` keeps
   it);
4. default ports dropped (``http:80``, ``https:443``); other ports
   kept;
5. path: trailing slashes trimmed (root stays ``/``; empty → ``/``);
   interior duplicate slashes and %-escapes are PRESERVED (decoding
   is deliberately out of scope — it is lossy without charset
   context);
6. query: params split on ``&``, empties and tracking params
   (``utm_*``, ``gclid``, ``fbclid``, ``ref``, ``msclkid``) dropped,
   the rest sorted bytewise and rejoined (param ORDER never
   distinguishes pages under this contract; VALUES are untouched);
7. fragment dropped.

All of it is ``regexp_extract`` / ``filter`` / ``sort_array`` /
``concat`` — whole-stage-codegen expressions, no UDF, no shuffle: at
10^12 rows canonicalization is a free map alongside the parquet scan.

:func:`url_registered_domain` gives the grouping key for per-site
politeness/caps: a documented HEURISTIC eTLD+1 (last two host labels,
or three when the last two are in a small built-in multi-part-suffix
list) — the container has no public-suffix list; swap one in by
passing ``extra_suffixes``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking params dropped by rule 6 (anchored param-name regex)
TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|ref|msclkid)(=|$)"

#: multi-part public suffixes for the registered-domain heuristic
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za", "co.nz",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lowercased scheme, '' when the string has no ``scheme://``."""
    return F.lower(F.regexp_extract(_c(col), _SCHEME_RE, 1))


def url_host(col: Column | str, strip_www: bool = True) -> Column:
    """Lowercased host: userinfo and port stripped, optional ``www.``
    drop. '' for non-urls."""
    auth = F.regexp_extract(_c(col), _AUTH_RE, 1)
    host = F.lower(
        F.regexp_replace(
            F.regexp_replace(auth, r"^[^@]*@", ""), r":[0-9]*$", ""
        )
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def url_port(col: Column | str) -> Column:
    """Explicit port string ('' when absent)."""
    auth = F.regexp_extract(_c(col), _AUTH_RE, 1)
    return F.regexp_extract(
        F.regexp_replace(auth, r"^[^@]*@", ""), r":([0-9]+)$", 1
    )


def url_path_norm(col: Column | str) -> Column:
    """Path with trailing slashes trimmed; '' / all-slash → '/'."""
    path = F.regexp_extract(_c(col), _PATH_RE, 1)
    trimmed = F.regexp_replace(path, r"/+$", "")
    return F.when(trimmed == "", F.lit("/")).otherwise(trimmed)


def url_query_norm(col: Column | str) -> Column:
    """Query with tracking/empty params dropped and the rest sorted
    bytewise; '' when nothing survives."""
    q = F.regexp_extract(_c(col), r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    return F.array_join(F.sort_array(kept), "&")


def url_normalize(col: Column | str, strip_www: bool = True) -> Column:
    """Canonical url string under the module contract; NULL for
    strings without a ``scheme://``."""
    c = _c(col)
    scheme = url_scheme(c)
    host = url_host(c, strip_www=strip_www)
    port = url_port(c)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    qs = url_query_norm(c)
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        url_path_norm(c),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", out)


def url_registered_domain(
    host: Column | str,
    extra_suffixes: Sequence[str] = (),
) -> Column:
    """Heuristic eTLD+1 from a (already-normalized) host: last two
    labels, or three when the trailing two are a known multi-part
    suffix. Single-label hosts pass through."""
    h = _c(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    suffixes = F.array(
        *[F.lit(s) for s in (*MULTI_SUFFIXES, *extra_suffixes)]
    )
    return (
        F.when(n <= 1, h)
        .when((n >= 3) & F.array_contains(suffixes, last2), last3)
        .otherwise(last2)
    )
