"""Full-text ranked retrieval over stored documents — the analytic twin
of the reference's Elasticsearch query surface: match query + sort +
paging (/root/reference/scripts/es_query.py:59-124) over analyzed
fields (/root/reference/scripts/es_load.py:13-80 defines the
analyzed/not_analyzed multifield mapping the spiders load into).

Scoring is TF-IDF-shaped but integer-quantized for cross-engine
determinism (group-sums of doubles are summation-order dependent; see
queries_textdedup module docstring):

  w(t)        = 1_000_000 DIV df(t)                  (integer idf)
  contrib     = tf(t, d) * w(t)                      (exact bigint)
  score(d)    = Σ_t contrib                          (exact bigint sum)
  norm_score  = (score * 1000) DIV (doc_len + 100)   (length norm)

Rank = ORDER BY norm_score DESC, doc_id ASC LIMIT k — the es_query.py
sort+size shape. The tokenizer is the shared words_col contract.

Scale shape: tf is a hash-groupBy on (doc_id, term) after a
broadcastable term-list filter (the inverted-index probe of a match
query); df is a per-term distinct count — both partial-aggregated
map-side. No window over the full corpus; the final top-k is
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_textdedup import SQL_WORDS, words_col

QUERY_TERMS = ["spark", "join", "window"]
K_MATCH = 10


def _t(spark, sf_dir, name):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def match_topk(docs, terms: list[str], k: int):
    """ES-style match query: rank docs containing ANY query term by
    integer TF-IDF with length norm; top-k with deterministic ties."""
    words = docs.select("doc_id", words_col(F.col("text")).alias("w"))
    doclen = words.select("doc_id", F.size("w").alias("doc_len"))
    hits = (
        words.select("doc_id", F.explode("w").alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = hits.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .withColumn("contrib", F.expr("tf * (1000000 DIV df)"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("contrib").cast("long").alias("score"),
        F.count(F.lit(1)).cast("int").alias("terms_matched"),
    )
    return (
        agg.join(doclen, "doc_id")
        .withColumn("norm_score", F.expr("(score * 1000) DIV (doc_len + 100)"))
        .orderBy(F.col("norm_score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "terms_matched", "score", "norm_score")
    )


def q_text_match_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return match_topk(docs, QUERY_TERMS, K_MATCH)


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

SQL_TEXT_MATCH_TOPK = f"""
WITH words AS (
  SELECT doc_id, {SQL_WORDS.format(t='text')} AS w FROM documents
), doclen AS (
  SELECT doc_id, len(w) AS doc_len FROM words
), hits AS (
  SELECT doc_id, unnest(w) AS term FROM words
), filtered AS (
  SELECT doc_id, term FROM hits WHERE term IN ({_TERMS_SQL})
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM filtered GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM filtered GROUP BY term
), scored AS (
  SELECT t.doc_id, t.tf * (1000000 // d.df) AS contrib
  FROM tf t JOIN df d ON t.term = d.term
), agg AS (
  SELECT doc_id, cast(sum(contrib) AS bigint) AS score,
         cast(count(*) AS int) AS terms_matched
  FROM scored GROUP BY doc_id
)
SELECT a.doc_id, a.terms_matched, a.score,
       (a.score * 1000) // (l.doc_len + 100) AS norm_score
FROM agg a JOIN doclen l ON a.doc_id = l.doc_id
ORDER BY norm_score DESC, a.doc_id ASC
LIMIT {K_MATCH}
"""


# --- ES parent/child relations --------------------------------------------------
def q_docs_with_children(spark, sf_dir):
    """The ES parent/child surface (es_load.py:36-80 maps commits with
    `_parent: repos`; es_query.py:83-105 filters children via
    has_parent and aggregates per group): parent docs = orders, child
    docs = lineitem. One query covers both directions —
    - has_child filter: keep only parents with ≥1 returned child
      (l_returnflag = 'R') — a LEFT SEMI join, never a fan-out;
    - per-parent child stats (the terms-agg + nested-stats shape):
      child count, exact integer quantity and revenue sums.
    Top-k parents by child count (ties by key) = the sort+size page."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    parents = orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
    )
    child_stats = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_children"),
        F.sum(dec("l_quantity")).cast("long").alias("qty_sum"),
        (F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))) * 10000)
        .cast("long")
        .alias("revenue_decimicro"),
    )
    return (
        parents.join(child_stats, parents.o_orderkey == child_stats.l_orderkey)
        .select(
            F.col("o_orderkey").alias("parent_id"),
            F.col("o_orderstatus").alias("status"),
            "n_children",
            "qty_sum",
            "revenue_decimicro",
        )
        .orderBy(F.col("n_children").desc(), F.col("parent_id").asc())
        .limit(K_MATCH)
    )


SQL_DOCS_WITH_CHILDREN = f"""
WITH parents AS (
  SELECT o.o_orderkey, o.o_orderstatus
  FROM orders o
  WHERE EXISTS (
    SELECT 1 FROM lineitem r
    WHERE r.l_orderkey = o.o_orderkey AND r.l_returnflag = 'R'
  )
), child_stats AS (
  SELECT l_orderkey,
         count(*) AS n_children,
         cast(sum(cast(l_quantity AS decimal(18,2))) AS bigint) AS qty_sum,
         cast(sum(cast(l_extendedprice AS decimal(18,2)) *
                  (1 - cast(l_discount AS decimal(18,2)))) * 10000 AS bigint)
           AS revenue_decimicro
  FROM lineitem GROUP BY l_orderkey
)
SELECT p.o_orderkey AS parent_id, p.o_orderstatus AS status,
       s.n_children, s.qty_sum, s.revenue_decimicro
FROM parents p JOIN child_stats s ON p.o_orderkey = s.l_orderkey
ORDER BY s.n_children DESC, parent_id ASC
LIMIT {K_MATCH}
"""


REGISTRY: dict[str, tuple] = {
    "text_match_topk": (q_text_match_topk, SQL_TEXT_MATCH_TOPK),
    "docs_with_children": (q_docs_with_children, SQL_DOCS_WITH_CHILDREN),
}
