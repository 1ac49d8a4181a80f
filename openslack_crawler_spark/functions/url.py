"""URL kernel: fixup, canonicalization, hashing, host extraction.

Reference semantics:
- scheme fixup: prepend http:// when the URL has no scheme
  (/root/reference/crawler/schedulers/kafka/scheduler.py:150-156).
- canonicalization: strip whitespace/punct, entity-decode, resolve vs
  base (/root/reference/crawler/utils/select_result.py:60-73,
  /root/reference/examples/lxmlhtml.py:53-62 via scrapy's
  canonicalize_url: sorted query params, no fragment).
- URL fingerprint: md5-hex in the reference bloom
  (/root/reference/crawler/utils/bloomfilter.py:45-47); rebuilt as
  xxhash64 (64-bit, JVM-side codegen) per BASELINE.json north_rule.

Everything here is either a pure column expression (JVM, codegen) or a
vectorized pandas UDF — no per-row Python (input_hint).
"""

from __future__ import annotations

import html as _html
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def fixup_url(url: Column) -> Column:
    """Prepend http:// when no scheme present (scheduler.py:150-156)."""
    return F.when(url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), url).otherwise(
        F.concat(F.lit("http://"), url)
    )


def _canonicalize_one(raw: str, base: str | None) -> str:
    """Pure-Python canonical form (shared with the parity oracle).

    Steps (documented contract, mirrors scrapy canonicalize_url's
    observable behavior on the reference's inputs): strip surrounding
    whitespace, HTML-entity decode, resolve against base, lowercase
    scheme+host, drop default port, sort query params, drop fragment,
    ensure non-empty path '/'.
    """
    if raw is None:
        return None
    u = _html.unescape(raw.strip())
    if base:
        u = urljoin(base, u)
    if "://" not in u:
        u = "http://" + u
    scheme, netloc, path, query, _frag = urlsplit(u)
    scheme = scheme.lower()
    host, sep, port = netloc.partition(":")
    host = host.lower().rstrip(".")
    if sep and port == DEFAULT_PORTS.get(scheme, ""):
        netloc = host
    else:
        netloc = host + (sep + port if sep else "")
    if not path:
        path = "/"
    q = urlencode(sorted(parse_qsl(query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, q, ""))


# fixed-point detector: lowercase scheme+host, no port, no query, no
# fragment, non-empty path of plain chars → _canonicalize_one(u) == u.
# Conservative by construction (anything unusual falls through to the
# full canonicalizer), so the fast path never changes results.
_FAST_CANONICAL_RE = r"^[a-z][a-z0-9+.\-]*://[a-z0-9\-]+(\.[a-z0-9\-]+)*/[A-Za-z0-9/_.~\-]*$"


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer (no base resolution).

    Hot-path engineering for 10^10-URL frontiers: a C-speed regex
    classifies already-canonical URLs (the overwhelming majority of a
    well-formed frontier) and only the remainder pays the per-string
    urllib cost."""
    fast = urls.str.match(_FAST_CANONICAL_RE, na=False)
    if fast.all():
        return urls
    out = urls.copy()
    slow = ~fast
    out[slow] = urls[slow].map(lambda u: _canonicalize_one(u, None))
    return out


@F.pandas_udf(T.StringType())
def canonicalize_with_base_udf(urls: pd.Series, bases: pd.Series) -> pd.Series:
    """Vectorized canonicalizer resolving relative URLs against a base
    column (lxmlhtml.py:53-62 urljoin semantics)."""
    return pd.Series(
        [_canonicalize_one(u, b) for u, b in zip(urls, bases)], dtype="object"
    )


def host_of(url: Column) -> Column:
    """Host extraction — JVM-side parse_url (csdn.py:87,100 did string
    splits; parse_url is the codegen'd equivalent)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def path_of(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def url_hash(url: Column) -> Column:
    """64-bit URL fingerprint (north_rule: xxhash64)."""
    return F.xxhash64(url)


def with_url_columns(df, url_col: str = "url", canonicalize: bool = True):
    """Attach (url canonical, host, url_hash, host_hash) to a DataFrame.

    The single entry point every ingest path goes through, so the seen
    filter and the frontier always agree on fingerprints.

    Hot-path note (measured, round 2): routing only messy rows through
    the UDF via a JVM-side rlike + filter/union split was tried and is
    a 3.4x REGRESSION at 32M rows (82.7s vs 24.0s, adjacent windows) —
    the double source scan + per-branch shuffles downstream cost far
    more than the Arrow round-trip it saves. The single ArrowEvalPython
    with the C-speed in-UDF fast path stays. (A `when(is_fast, url)
    .otherwise(udf(url))` is no alternative: Spark hoists the UDF into
    an ArrowEvalPython evaluated over every batch row regardless.)"""
    out = df.withColumn(url_col, fixup_url(F.col(url_col)))
    if canonicalize:
        out = out.withColumn(url_col, canonicalize_udf(F.col(url_col)))
    return (
        out.withColumn("host", host_of(F.col(url_col)))
        .withColumn("url_hash", url_hash(F.col(url_col)))
        .withColumn("host_hash", F.xxhash64(F.col("host")))
    )
