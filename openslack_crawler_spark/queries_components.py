"""Dedup-cluster assignment: connected components over the MinHash-LSH
near-duplicate pair graph — an ITERATIVE DataFrame algorithm (min-label
propagation) cross-checked against a DuckDB recursive-CTE transitive
closure. Component id = min doc_id in the cluster (the kept copy)."""

from __future__ import annotations

from .operators.components import connected_components
from .queries_textdedup import (
    SQL_SHINGLES,
    SQL_WORDS,
    LSH_BAND_SIZE,
    MINHASH_PERMS,
    q_minhash_lsh_pairs,
)


def q_dedup_components(spark, sf_dir):
    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    return connected_components(pairs, src="doc_a", dst="doc_b").selectExpr(
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


REGISTRY: dict[str, tuple] = {
    "dedup_components": (q_dedup_components, SQL_DEDUP_COMPONENTS),
}
