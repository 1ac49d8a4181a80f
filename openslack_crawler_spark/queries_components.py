"""Dedup-cluster assignment: connected components over the MinHash-LSH
near-duplicate pair graph — an ITERATIVE DataFrame algorithm (min-label
propagation) cross-checked against a DuckDB recursive-CTE transitive
closure. Component id = min doc_id in the cluster (the kept copy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.components import ckpt_auto, connected_components
from .queries_textdedup import (
    SQL_SHINGLES,
    SQL_WORDS,
    STOPWORDS,
    LSH_BAND_SIZE,
    MINHASH_PERMS,
    corpus_clean_docs,
    fan_out,
    minhash_band_star_edges,
    words_col,
    _t,
)


def q_dedup_components(spark, sf_dir):
    """CC over STAR edges, not clique pairs: (bucket_min → member) per
    LSH bucket preserves components exactly (see
    minhash_band_star_edges) while an O(B²) clique bucket becomes O(B)
    — the difference between 10^12 and 10^6 edge rows on a 10^6-copy
    duplicate cluster at crawl scale. The recursive-CTE oracle still
    closes over clique pairs; the components are identical."""
    docs = fan_out(_t(spark, sf_dir, "documents")).select(
        "doc_id", words_col(F.col("text")).alias("w")
    )
    edges = minhash_band_star_edges(docs)
    return connected_components(edges, src="doc_a", dst="doc_b").selectExpr(
        "node AS doc_id", "component"
    )


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE words AS (
  SELECT doc_id, {SQL_WORDS.format(t='text')} AS w FROM documents
), sh AS (
  SELECT doc_id, unnest({SQL_SHINGLES}) AS sh FROM words
), hx AS (
  SELECT doc_id, cast(perm AS int) AS perm,
         cast(concat('0x', substr(md5(concat(perm, '|', sh)), 1, 15)) AS bigint) AS h
  FROM sh, generate_series(1, {MINHASH_PERMS}) AS t(perm)
), sig AS (
  SELECT doc_id, perm, min(h) AS minhash FROM hx GROUP BY doc_id, perm
), bands AS (
  SELECT doc_id, cast((perm - 1) // {LSH_BAND_SIZE} AS int) AS band,
         string_agg(cast(minhash AS varchar), ',' ORDER BY perm) AS band_sig
  FROM sig GROUP BY doc_id, cast((perm - 1) // {LSH_BAND_SIZE} AS int)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.doc_id < b.doc_id
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.a, r.comp FROM sym s JOIN reach r ON s.b = r.node
)
SELECT node AS doc_id, min(comp) AS component FROM reach GROUP BY node
"""


# --- the full pretraining-corpus pipeline with FUZZY dedup ---------------------
def q_corpus_clean_fuzzy(spark, sf_dir, checkpoint_dir: str | None = None):
    """The actual 100 TB pretraining pipeline end-to-end: Gopher quality
    gate → language gate → exact fingerprint dedup → MinHash-band STAR
    edges (bucket_min → member; O(B) per bucket, components identical
    to clique pairs — see minhash_band_star_edges) → connected
    components → keep the min doc_id per near-dup cluster → per-source
    corpus stats. Stage costs: narrow filters, one hash shuffle for the
    exact dedup, one window Exchange (never all-pairs, no self-join)
    for the edges, O(log diameter) label-propagation rounds, one
    broadcast-able anti-join to drop cluster losers."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    # two consumers (pair generation + survivor stats) — materialize so
    # the gate/dedup pipeline runs once
    cleaned = ckpt_auto(corpus_clean_docs(docs))
    edges = minhash_band_star_edges(cleaned.select("doc_id", "w"))
    comp = connected_components(
        edges, src="doc_a", dst="doc_b", checkpoint_dir=checkpoint_dir
    )
    losers = comp.filter(F.col("component") < F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    survivors = cleaned.join(losers, "doc_id", "left_anti")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
    )


_SQL_STOP_LIST = ", ".join("'" + s + "'" for s in STOPWORDS)

SQL_CORPUS_CLEAN_FUZZY = f"""
WITH RECURSIVE words AS (
  SELECT doc_id, source, {SQL_WORDS.format(t='text')} AS w FROM documents
), m AS (
  SELECT doc_id, source, w, len(w) AS n_tokens,
         cast(concat('0x', substr(md5(array_to_string(w, ' ')), 1, 15)) AS bigint) AS fingerprint,
         CASE WHEN len(w) > 0
              THEN floor(list_sum(list_transform(w, x -> length(x))) * 1000000 / len(w))
              ELSE 0 END AS mean_word_len_micro,
         CASE WHEN len(w) > 0
              THEN floor(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1000000 / len(w))
              ELSE 0 END AS alpha_ratio_micro,
         len(list_filter(w, x -> x IN ({_SQL_STOP_LIST}))) AS n_stopwords,
         len(list_filter(w, x -> x IN ('the', 'and', 'of', 'a'))) AS en_markers
  FROM words
), kept AS (
  SELECT doc_id, source, w, n_tokens FROM (
    SELECT doc_id, source, w, n_tokens,
           row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id ASC) AS rn
    FROM m
    WHERE n_tokens >= 10 AND n_tokens <= 1000
      AND mean_word_len_micro >= 3000000 AND mean_word_len_micro <= 10000000
      AND alpha_ratio_micro >= 800000
      AND n_stopwords >= 2
      AND en_markers >= 1
  ) WHERE rn = 1
), sh AS (
  SELECT doc_id, unnest({SQL_SHINGLES}) AS sh FROM kept
), hx AS (
  SELECT doc_id, cast(perm AS int) AS perm,
         cast(concat('0x', substr(md5(concat(perm, '|', sh)), 1, 15)) AS bigint) AS h
  FROM sh, generate_series(1, {MINHASH_PERMS}) AS t(perm)
), sig AS (
  SELECT doc_id, perm, min(h) AS minhash FROM hx GROUP BY doc_id, perm
), bands AS (
  SELECT doc_id, cast((perm - 1) // {LSH_BAND_SIZE} AS int) AS band,
         string_agg(cast(minhash AS varchar), ',' ORDER BY perm) AS band_sig
  FROM sig GROUP BY doc_id, cast((perm - 1) // {LSH_BAND_SIZE} AS int)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.doc_id < b.doc_id
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(node, comp) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.a, r.comp FROM sym s JOIN reach r ON s.b = r.node
), losers AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING min(comp) < node
)
SELECT source, count(*) AS docs_kept,
       cast(sum(n_tokens) AS bigint) AS tokens_total
FROM kept
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
GROUP BY source
"""


# --- link-graph rank propagation (OPIC/PageRank-style crawl priority) -------
RANK_ITERS = 3
RANK_HOSTS = 50
DAMP_NUM, DAMP_DEN = 85, 100   # 0.85 damping in exact integer arithmetic
BASE_MICRO = 150_000           # (1 - d) in micro-units
INIT_MICRO = 1_000_000


def q_link_rank(spark, sf_dir):
    """Link-based frontier priority — the OPIC / PageRank family every
    large crawler uses to decide WHICH host to fetch next (the
    reference ranks by static request priority, queue.py:75-90; link
    rank is the web-scale generalization). Iterative WEIGHTED
    sum-propagation — a different operator class from CC's
    min-propagation: rank'(h) = (1-d) + d * Σ rank(g)/outdeg(g) over
    in-links, RANK_ITERS fixed rounds.

    Determinism contract: all arithmetic in integer micro-units with
    exact DIV (per-edge contrib = rank DIV outdeg, then
    (d_num * Σ) DIV d_den) — bit-identical in Spark and DuckDB, no
    doubles anywhere.

    Scale shape: the edge list is the big side — partition it ONCE on
    src and keep it resident; each round shuffles only the #hosts-row
    rank table against it (the CC probe-side-only discipline), plus one
    groupBy(dst) partial agg. Fixed iteration count → lineage depth 3,
    no checkpoint needed. The synthetic click graph (user→page events)
    stands in for the host graph at sf scale."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    edges = ev.select(
        F.pmod(F.col("user_id"), F.lit(RANK_HOSTS)).alias("src"),
        F.pmod(F.col("event_id"), F.lit(RANK_HOSTS)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    edges = ckpt_auto(edges.repartition(F.col("src")))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    ranks = nodes.select("host", F.lit(INIT_MICRO).cast("long").alias("rank_micro"))
    for _ in range(RANK_ITERS):
        contrib = (
            ranks.join(outdeg, ranks.host == outdeg.src)
            .select(
                F.col("src"),
                F.expr("rank_micro DIV outdeg").alias("contrib"),
            )
            .join(edges, "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum("contrib").alias("in_micro"))
        )
        ranks = nodes.join(contrib, "host", "left").select(
            "host",
            (
                F.lit(BASE_MICRO)
                + F.expr(f"{DAMP_NUM} * coalesce(in_micro, 0) DIV {DAMP_DEN}")
            ).cast("long").alias("rank_micro"),
        )
    return ranks


def _sql_rank_iter(prev: str, out: str) -> str:
    return f"""{out} AS (
  SELECT n.host,
         cast({BASE_MICRO} + ({DAMP_NUM} * coalesce(c.in_micro, 0)) // {DAMP_DEN} AS bigint) AS rank_micro
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS host, sum(r.rank_micro // o.outdeg) AS in_micro
    FROM {prev} r JOIN outdeg o ON r.host = o.src JOIN edges e ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.host = c.host
)"""


SQL_LINK_RANK = f"""
WITH edges AS (
  SELECT user_id % {RANK_HOSTS} AS src, event_id % {RANK_HOSTS} AS dst
  FROM events WHERE event_type = 'click' AND user_id % {RANK_HOSTS} <> event_id % {RANK_HOSTS}
), outdeg AS (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src
), nodes AS (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
), r0 AS (
  SELECT host, cast({INIT_MICRO} AS bigint) AS rank_micro FROM nodes
), {_sql_rank_iter('r0', 'r1')}, {_sql_rank_iter('r1', 'r2')}, {_sql_rank_iter('r2', 'r3')}
SELECT host, rank_micro FROM r3
"""


REGISTRY: dict[str, tuple] = {
    "dedup_components": (q_dedup_components, SQL_DEDUP_COMPONENTS),
    "corpus_clean_fuzzy": (q_corpus_clean_fuzzy, SQL_CORPUS_CLEAN_FUZZY),
    "link_rank": (q_link_rank, SQL_LINK_RANK),
}
