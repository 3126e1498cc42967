"""Python UDTFs (SURVEY §2.10 U5 — the one-row-to-many-rows surface).

The reference's tag-dispatch parse loop (main.py:135-143, 172-175) is a
hand-rolled table function: one XML stream in, many revision rows out.
The engine's heavy form of that is mapInPandas (sources/wiki_xml.py);
this module is the lightweight registered-function form — usable from
SQL via LATERAL, composable per row, Arrow-batched by Spark 4.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="idx int, sentence string, n_words int")
class SplitSentences:
    """text -> one row per sentence, with position and word count."""

    def eval(self, text: str):
        if text is None:
            return
        for i, s in enumerate(re.split(r"(?<=[.!?])\s+", text.strip())):
            if s:
                yield i, s, len(s.split())


def register_udtfs(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentences)
