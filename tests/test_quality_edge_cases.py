"""Round-5 advisor fixes: int32 overflow in dup_word_micro on long
documents, and bm25_topk on an empty corpus (the corpus-stats scalars
come back NULL and must not be interpolated into SQL)."""

from pyspark.sql import functions as F

from openslack_crawler_spark.queries_fulltext import QUERY_TERMS, bm25_topk
from openslack_crawler_spark.queries_quality import q_repetition_ratio


def test_dup_word_micro_no_int32_overflow(spark, tmp_path):
    # 3000 duplicate words: (3000 * 1_000_000) overflows int32 if the
    # product is computed in 32-bit like the pre-fix code did
    text = " ".join(["word"] * 3001)
    spark.createDataFrame(
        [(1, text)], "doc_id bigint, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = (
        q_repetition_ratio(spark, str(tmp_path))
        .filter(F.col("doc_id") == 1)
        .collect()[0]
    )
    # 3000 dup words / 3001 words -> floor(3000e6/3001) = 999666
    assert row["dup_word_micro"] == 999666
    assert row["dup_word_micro"] > 0  # the wrapped value was negative


def test_bm25_empty_corpus_returns_empty(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    out = bm25_topk(docs, QUERY_TERMS, 10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "terms_matched", "bm25_score",
    ]
