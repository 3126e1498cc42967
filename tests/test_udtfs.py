"""UDTF surface (U5): registered table function via LATERAL."""

from __future__ import annotations

from diachronic_spark.functions.udtfs import SplitSentences, register_udtfs


def test_split_sentences_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.idx, s.sentence, s.n_words
        FROM docs_udtf d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.idx
        """
    ).collect()
    assert [(r.doc_id, r.idx, r.sentence, r.n_words) for r in rows] == [
        (1, 0, "Hello world.", 2),
        (1, 1, "How are you?", 3),
        (1, 2, "Fine!", 1),
    ]


def test_udtf_direct_call(spark):
    from pyspark.sql.functions import lit

    rows = SplitSentences(lit("One. Two.")).collect()
    assert [(r.idx, r.sentence) for r in rows] == [(0, "One."), (1, "Two.")]
