"""Driver-contract invariants: the correctness gate checks the FIRST 50
registry entries, so the explicit window must stay exactly 50, fully
resolvable, and must contain every flagship operator."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry

FLAGSHIPS = [
    "seen_antijoin", "crawl_e2e", "crawl_e2e_summary",
    "dedup_components", "ann_ivf_topk",
    "media_content_dedup", "corpus_clean_fuzzy",
    "corpus_clean_pipeline", "minhash_lsh_pairs",
    "text_bm25_topk", "mix_weights_temperature", "corpus_shard_pack",
    # new round-4 ops, in-window their first round
    "chunk_dedup", "repetition_ratio", "mix_epochs",
    # round-4 rotation targets: never driver-verified before this round
    "minhash_incremental_pairs", "media_frame_sample", "host_extract",
    "pricing_summary", "top_revenue_orders", "stats_max_min",
    "event_gaps", "fifo_pop", "lifo_pop", "json_export",
    "null_strip_collapse", "date_parse_natural", "content_disposition",
    "rule_routing", "media_fetch_plan", "string_processors",
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
