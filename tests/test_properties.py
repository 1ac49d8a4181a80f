"""Property-based tests (hypothesis) for the pure kernels — laws the
reference's example-based suite never pinned (SURVEY.md §5 notes
property tests are absent there).

These run WITHOUT Spark (pure-Python twins shared with the engine), so
hypothesis can afford hundreds of cases.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from openslack_crawler_spark.functions.url import _canonicalize_one
from openslack_crawler_spark.functions.html import extract_links_py
from openslack_crawler_spark.oracle import CrawlOracle
from openslack_crawler_spark.synthetic import py_outlinks, py_spans

url_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           whitelist_characters="./-_?&=#: "),
    min_size=1, max_size=80,
)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(url_text)
def test_canonicalize_idempotent(raw):
    """canonicalize(canonicalize(x)) == canonicalize(x) — the fixed-point
    property the fast-path regex relies on."""
    once = _canonicalize_one(raw, None)
    assert _canonicalize_one(once, None) == once


@settings(max_examples=300, deadline=None, derandomize=True)
@given(url_text)
def test_canonicalize_always_absolute(raw):
    assert "://" in _canonicalize_one(raw, None)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=2, max_value=500))
def test_page_graph_wellformed(page, hosts):
    """Every generated outlink parses back into the same graph domain,
    and spans are dense/ordered (the input_hint invariant)."""
    url = f"http://host-1.example/p/{page}"
    links = py_outlinks(url, hosts)
    assert len(links) <= 9
    for link in links:
        assert link.startswith("http://host-")
        assert _canonicalize_one(link, None) == link  # graph emits canonical URLs
    spans = py_spans(url, hosts)
    assert [s[3] for s in spans] == list(range(len(spans)))  # dense offsets
    assert spans[0][0] == "text"
    assert [s[1] for s in spans if s[0] == "link"] == links  # order preserved


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 100)),  # (page, priority)
        min_size=1, max_size=60,
    )
)
def test_oracle_invariants(seed_pairs):
    """Scheduler laws on random seed lists: no URL fetched twice, the
    seen set covers every fetched and frontier URL, per-host per-round
    budget respected."""
    seeds = [
        (f"http://host-{(p % 5) + 1}.example/p/{p}", pr, i)
        for i, (p, pr) in enumerate(seed_pairs)
    ]
    k = 3
    o = CrawlOracle({}, n_hosts=5, k_per_host=k, maxdepth=1)
    o.bootstrap(seeds)
    o.run(3)
    fetched = [e["url"] for e in o.fetch_log]
    assert len(fetched) == len(set(fetched))  # never fetch a URL twice
    assert set(fetched) <= o.seen
    assert {r.url for r in o.frontier} <= o.seen
    from collections import Counter

    per_round_host = Counter(
        (e["round"], e["url"].split("/")[2]) for e in o.fetch_log
    )
    assert all(v <= k for v in per_round_host.values())  # politeness budget


@settings(max_examples=150, deadline=None, derandomize=True)
@given(st.text(max_size=300), url_text)
def test_html_extractor_never_crashes(html, base):
    out = extract_links_py(html, "http://" + base.replace(" ", ""))
    assert isinstance(out, list)


# --- round-5: the vectorized batch canonicalizer vs the scalar reference ----
_SCHEME = st.sampled_from(["http", "HTTP", "https", "ftp", "foo", "HtTp"])
_HOST = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789.-", min_size=1, max_size=16
)
_PATH = st.sampled_from(["", "/", "/a/b", "/A/../b//", "/%2F/x", "/p_.~-"])
_PORT = st.sampled_from(["", ":80", ":443", ":21", ":8080", ":", ":0080"])
_KV = st.text(alphabet="azAZ09_.~-", min_size=1, max_size=6)
_PAIR = st.tuples(_KV, st.one_of(st.none(), _KV)).map(
    lambda t: t[0] if t[1] is None else f"{t[0]}={t[1]}"
)
_QUERY = st.lists(_PAIR, max_size=4).map(lambda ps: "?" + "&".join(ps) if ps else "")
_FRAG = st.sampled_from(["", "#f", "#a?b=1", "#&amp;x"])


@given(_SCHEME, _HOST, _PORT, _PATH, _QUERY, _FRAG)
@settings(max_examples=300, deadline=None)
def test_batch_canonicalizer_matches_scalar_reference(sch, host, port, path, q, frag):
    """The tier-2 vectorized kernel must agree with _canonicalize_one on
    the whole messy-but-regular URL domain (and the residue router must
    agree trivially, since it CALLS _canonicalize_one)."""
    import pandas as pd

    from openslack_crawler_spark.functions.url import _canonicalize_batch

    url = f"{sch}://{host}{port}{path}{q}{frag}"
    got = _canonicalize_batch(pd.Series([url], dtype="object")).iloc[0]
    assert got == _canonicalize_one(url, None)


@given(st.text(min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_batch_canonicalizer_total_on_garbage(raw):
    """No input string may crash the batch kernel (a 10^10-row frontier
    contains garbage), and it must still match the scalar reference."""
    import pandas as pd

    from openslack_crawler_spark.functions.url import _canonicalize_batch

    url = raw if "://" in raw else "http://" + raw
    got = _canonicalize_batch(pd.Series([url], dtype="object")).iloc[0]
    assert got == _canonicalize_one(url, None)
