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
    try:
        if base:
            u = urljoin(base, u)
        if "://" not in u:
            u = "http://" + u
        scheme, netloc, path, query, _frag = urlsplit(u)
    except ValueError:
        # malformed beyond parsing (e.g. stray '[' trips urlsplit's IPv6
        # validation) — a 10^10-row frontier WILL contain such URLs and
        # one of them must not kill the job; pass the string through
        # unchanged (it will simply never match a well-formed URL)
        return u
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


def _canonicalize_batch(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer batch kernel (no base resolution) —
    module-level so tests can fuzz it against _canonicalize_one without
    a SparkSession.

    Hot-path engineering for 10^10-URL frontiers, three tiers by cost:
    (1) a C-speed regex passes already-canonical URLs through (the
    majority of a well-formed frontier); (2) REGULAR messy URLs —
    case/port/fragment/unsorted-query, the bulk of real crawl mess —
    canonicalize via one vectorized str.extract + column assembly
    (~1µs/row, see _canonicalize_tier2); (3) only the residue pays the
    ~18µs/row urllib path. Nulls count as fast (canonical(None) is
    None)."""
    fast = urls.isna() | urls.str.match(_FAST_CANONICAL_RE, na=False)
    if fast.all():
        return urls
    out = urls.copy()
    sub = urls[~fast]  # regex the non-fast slice only
    tier2 = sub.str.match(_TIER2_RE, na=False)
    if tier2.any():
        # entity guard only where an '&' exists (contains is cheap)
        risky = tier2 & sub.str.contains("&", regex=False)
        if risky.any():
            tier2 &= ~(risky & sub.str.contains(_ENTITY_GUARD_RE, regex=True))
        t2 = sub[tier2]
        out[t2.index] = _canonicalize_tier2(t2)
    residue = sub[~tier2]
    if len(residue):
        out[residue.index] = residue.map(lambda u: _canonicalize_one(u, None))
    return out


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Arrow seam for _canonicalize_batch (see its docstring)."""
    return _canonicalize_batch(urls)


# ---------------------------------------------------------------------------
# Tier-2: VECTORIZED canonicalization for REGULAR messy URLs — the case/
# port/fragment/unsorted-query messiness that dominates real crawl input.
# Lives INSIDE the pandas UDF (one C-speed str.extract + vectorized
# assembly), so the ~18µs/row urllib path is paid only by the residue.
# A JVM column-expression version of the same tiering was built and
# MEASURED SLOWER than the UDF (see PLANS.md round-5 negative result):
# the chain of per-row string expressions costs more than Arrow+pandas.
#
# The guard is conservative by construction: a URL is tier-2-eligible
# only when every _canonicalize_one step is provably expressible in the
# vectorized transform; everything else (entities, %-encoded or exotic
# query chars, userinfo, second '=', whitespace) falls through to
# _canonicalize_one, which remains the semantic source of truth.
#
# Domain the guard admits (after fixup_url):
#   scheme://host(:port)?(/path)?(?query)?(#fragment)?
#   host  = [A-Za-z0-9.-]+        (no userinfo, no IPv6 brackets)
#   path  = [A-Za-z0-9/_.~%-]*    (untouched by Python — %-escapes pass through)
#   query = k(=v)? pairs, charset [A-Za-z0-9_.~-] (quote_plus-identity set:
#           no %, +, *, space — so parse_qsl→urlencode is identity modulo
#           pair sort and bare-key 'k' → 'k=')
#   and NO html.unescape trigger: ';' never appears (charsets exclude it, so
#   '&name;' is impossible) and the 106 LEGACY no-semicolon entities
#   ('&copy', '&para', ... fire mid-string: unescape('a&copy=1')='a©=1') are
#   excluded by _ENTITY_GUARD_RE built from html.entities.html5 itself.
#   and the host must contain at least one NON-DOT char: an all-dot host
#   rstrips to '' and urlunsplit then re-emits '//' only for uses_netloc
#   schemes — a branch the vectorized assembly cannot see (advisor r5,
#   medium: 'foo://.../x' → scalar 'foo:/x' vs naive batch 'foo:///x').
#   Such hosts route to the _canonicalize_one residue instead.
_TIER2_RE = (
    r"^[A-Za-z][A-Za-z0-9+.\-]*://\.*[A-Za-z0-9\-][A-Za-z0-9.\-]*(:[0-9]*)?"
    r"(/[A-Za-z0-9/_.~%\-]*)?"
    r"(\?([A-Za-z0-9_.~\-]+(=[A-Za-z0-9_.~\-]*)?"
    r"(&[A-Za-z0-9_.~\-]+(=[A-Za-z0-9_.~\-]*)?)*)?)?"
    r"(#.*)?$"
)

# capture groups for the vectorized transform (same domain as _TIER2_RE)
_TIER2_EXTRACT_RE = (
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://"      # 1 scheme
    r"(\.*[A-Za-z0-9\-][A-Za-z0-9.\-]*)(:[0-9]*)?"  # 2 host (≥1 non-dot), 3 :port
    r"((?:/[A-Za-z0-9/_.~%\-]*)?)"          # 4 path
    r"(?:\?([A-Za-z0-9_.~\-=&]*))?"         # 5 query
    r"(?:#.*)?$"
)

_DEFAULT_PORT_FOR = {"http": ":80", "https": ":443", "ftp": ":21"}


def _no_semicolon_entities() -> list[str]:
    from html.entities import html5  # noqa: PLC0415

    return sorted(
        (k for k in html5 if not k.endswith(";")), key=len, reverse=True
    )


_ENTITY_GUARD_RE = "&(?:" + "|".join(_no_semicolon_entities()) + ")"


def _sort_query(q: str) -> str:
    """parse_qsl + sorted + urlencode restricted to the tier-2 charset:
    split pairs, bare key k → ('k',''), sort by the (k, v) TUPLE (raw
    string sort diverges on prefix keys: 'a=x' vs 'a1=y' compares '='
    0x3D against '1' 0x31), rejoin as k=v."""
    pairs = sorted(
        tuple(p.split("=", 1)) if "=" in p else (p, "")
        for p in q.split("&")
    )
    return "&".join(k + "=" + v for k, v in pairs)


def _canonicalize_tier2(urls: pd.Series) -> pd.Series:
    """Vectorized canonical form, valid ONLY on the tier-2 domain
    (equivalence vs _canonicalize_one pinned on fixtures + fuzz in
    tests/test_url_kernel.py)."""
    g = urls.str.extract(_TIER2_EXTRACT_RE)  # columns 0..4 = the groups
    scheme = g[0].str.lower()
    host = g[1].str.lower().str.rstrip(".")
    # drop ':port' when it equals the scheme default; unknown schemes
    # default to ':' so a bare 'host:' is collapsed (DEFAULT_PORTS.get(s,''))
    port = g[2].fillna("")
    default = scheme.map(_DEFAULT_PORT_FOR).fillna(":")
    port = port.where((port != default) & (port != ""), "")
    path = g[3].fillna("")
    path = path.where(path != "", "/")
    q = g[4]
    sortable = q.notna() & (q != "")
    qs = pd.Series("", index=urls.index, dtype="object")
    if sortable.any():
        qs[sortable] = "?" + q[sortable].map(_sort_query)
    return scheme + "://" + host + port + path + qs


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
