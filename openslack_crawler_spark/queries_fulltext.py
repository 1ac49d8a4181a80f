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


# --- BM25 ranked retrieval -------------------------------------------------------
# Okapi BM25 with Lucene's non-negative idf, integer-quantized for
# cross-engine determinism. k1=1.2 and b=0.75 ride as centi-integers;
# the only double is ln() over an exact integer rational (floored to
# micro units), same rational in both engines:
#   idf_micro   = floor(1e6 * ln(1 + (N - df + 0.5)/(df + 0.5)))
#   dl_ratio_c  = (100 * dl * N) DIV total_len        (dl/avgdl, centi)
#   norm_c      = (100 - 75) + (75 * dl_ratio_c) DIV 100
#   tf_milli    = (1000 * tf * (100 + 120)) DIV (100 * tf + 120 * norm_c)
#   score       = Σ_t idf_micro(t) * tf_milli(t, d)   (exact bigint)
BM25_K1_CENTI = 120
BM25_B_CENTI = 75


def bm25_topk(docs, terms: list[str], k: int):
    """BM25 ranking: tf saturation (k1) + doc-length normalization (b)
    + proper idf — the scoring the ES match surface actually uses
    (es_query.py relies on ES default similarity = BM25). Same scale
    shape as match_topk: term-filtered hash-groupBy tf, broadcast df,
    one corpus-stats scalar join, TakeOrderedAndProject top-k."""
    words = docs.select("doc_id", words_col(F.col("text")).alias("w"))
    doclen = words.select("doc_id", F.size("w").alias("doc_len"))
    # two corpus-stats scalars (N, total_len) collected once driver-side
    # (O(1), like IVF centroids) and inlined as literals — the former
    # crossJoin(broadcast(1-row agg)) planned a BroadcastNestedLoopJoin,
    # which the repo-wide plan lint now forbids outright.
    n_docs, total_len = doclen.agg(
        F.count(F.lit(1)),
        F.sum("doc_len").cast("long"),
    ).first()
    if not n_docs or not total_len:
        # empty/degenerate corpus: total_len is NULL and interpolating
        # the literal `None` below would raise at analysis time — the
        # correct answer is simply no hits, with the output schema intact
        return docs.select(
            "doc_id",
            F.lit(0).cast("int").alias("terms_matched"),
            F.lit(0).cast("long").alias("bm25_score"),
        ).limit(0)
    hits = (
        words.select("doc_id", F.explode("w").alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # idf residual risk (documented, accepted): floor(1e6·ln(x)) assumes
    # JVM Math.log and DuckDB's libm agree at the micro-unit boundary;
    # ln is not IEEE-correctly-rounded, so a 1-ulp disagreement exactly
    # at an integer boundary could flip the floor. No observed case at
    # any tested SF; the quantized-rational alternative trades this
    # ~1e-10/evaluation risk for a nonstandard BM25, so it stays.
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(doclen, "doc_id")
        .withColumn(
            "idf_micro",
            F.floor(
                F.lit(1_000_000.0)
                * F.log(
                    1
                    + (2 * (F.lit(n_docs) - F.col("df")) + 1)
                    / (2 * F.col("df") + 1)
                )
            ).cast("long"),
        )
        .withColumn(
            "norm_c",
            F.expr(
                f"(100 - {BM25_B_CENTI}) + "
                f"({BM25_B_CENTI} * ((100 * doc_len * {n_docs}) DIV {total_len})) DIV 100"
            ),
        )
        .withColumn(
            "tf_milli",
            F.expr(
                f"(1000 * tf * (100 + {BM25_K1_CENTI})) "
                f"DIV (100 * tf + {BM25_K1_CENTI} * norm_c)"
            ),
        )
        .withColumn("contrib", F.col("idf_micro") * F.col("tf_milli"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("contrib").cast("long").alias("bm25_score"),
        F.count(F.lit(1)).cast("int").alias("terms_matched"),
    )
    return (
        agg.orderBy(F.col("bm25_score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "terms_matched", "bm25_score")
    )


def q_text_bm25_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, QUERY_TERMS, K_MATCH)


SQL_TEXT_BM25_TOPK = f"""
WITH words AS (
  SELECT doc_id, {SQL_WORDS.format(t='text')} AS w FROM documents
), doclen AS (
  SELECT doc_id, len(w) AS doc_len FROM words
), corpus AS (
  SELECT count(*) AS n_docs, cast(sum(doc_len) AS bigint) AS total_len
  FROM doclen
), hits AS (
  SELECT doc_id, unnest(w) AS term FROM words
), filtered AS (
  SELECT doc_id, term FROM hits WHERE term IN ({_TERMS_SQL})
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM filtered GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM filtered GROUP BY term
), scored AS (
  SELECT t.doc_id,
         cast(floor(1000000.0 * ln(
           1 + (2 * (c.n_docs - d.df) + 1) / cast(2 * d.df + 1 AS double)
         )) AS bigint)
         * ((1000 * t.tf * (100 + {BM25_K1_CENTI})) //
            (100 * t.tf + {BM25_K1_CENTI} *
             ((100 - {BM25_B_CENTI}) +
              ({BM25_B_CENTI} * ((100 * l.doc_len * c.n_docs) // c.total_len)) // 100)))
           AS contrib
  FROM tf t
  JOIN df d ON t.term = d.term
  JOIN doclen l ON t.doc_id = l.doc_id
  CROSS JOIN corpus c
)
SELECT doc_id, cast(count(*) AS int) AS terms_matched,
       cast(sum(contrib) AS bigint) AS bm25_score
FROM scored GROUP BY doc_id
ORDER BY bm25_score DESC, doc_id ASC
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
    "text_bm25_topk": (q_text_bm25_topk, SQL_TEXT_BM25_TOPK),
    "docs_with_children": (q_docs_with_children, SQL_DOCS_WITH_CHILDREN),
}
