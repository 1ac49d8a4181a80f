"""Driver-contract invariants: the correctness gate checks the FIRST 50
registry entries, so the explicit window must stay exactly 50, fully
resolvable, and must contain every flagship operator."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry

FLAGSHIPS = [
    "seen_antijoin", "crawl_e2e", "crawl_e2e_summary",
    "dedup_components", "ann_ivf_topk", "text_match_topk", "sessionize",
    "media_content_dedup", "media_thumbnails", "corpus_clean_fuzzy",
    "docs_with_children", "corpus_clean_pipeline", "minhash_lsh_pairs",
    "text_bm25_topk", "corpus_sample_stratified", "mix_weights_temperature",
    "corpus_shard_pack", "decontaminate_overlap", "pii_scan",
]


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
