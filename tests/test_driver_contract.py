"""Driver-contract invariants: the correctness gate checks the FIRST 50
registry entries, so the explicit window must stay exactly 50, fully
resolvable, and must contain every flagship operator."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry

FLAGSHIPS = [
    # the crawl core + composite pipelines: always in-window (their
    # answers depend on many operators at once, so they catch cross-
    # cutting regressions the single-op queries can't)
    "seen_antijoin", "crawl_e2e", "crawl_e2e_summary",
    "dedup_components", "ann_ivf_topk",
    "corpus_clean_fuzzy", "corpus_clean_pipeline", "minhash_lsh_pairs",
    "text_bm25_topk",
    # new round-5 query, in-window its first round
    "ann_recall_report",
]
# rotation completeness (which stale/new queries must be in-window) is
# enforced mechanically by tests/test_rotation_guard.py + greenmap.json


def test_window_is_exactly_50_and_resolvable():
    names = list(entry.queries())
    assert len(entry._WINDOW) == 50
    assert names[:50] == entry._WINDOW  # every window name resolved
    assert len(names) == len(set(names))


def test_flagships_inside_window():
    names = list(entry.queries())[:50]
    missing = [f for f in FLAGSHIPS if f not in names]
    assert not missing, missing


def test_oracle_sql_subset_and_rows_only_contract():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    assert set(qs) - set(os_) == {"crawl_e2e"}  # the only rows-only entry
