"""Python UDTF extension point (Spark 4): one row in, a TABLE of rows out.

The engine's contract is zero row-at-a-time Python in parity paths, and the
sanctioned Python boundaries are Arrow ``mapInPandas``/``pandas_udf``
(llm/multimodal.py, llm/vectorized.py). UDTFs are the third boundary Spark 4
adds — a table function usable from both the DataFrame API and SQL
(``SELECT * FROM sentence_split(TABLE(...))``) for genuinely row-expanding
custom logic. This module registers ONE deterministic demo (sentence
splitting) whose semantics are simple enough to oracle-check in DuckDB via
regexp splitting — pinning that the UDTF boundary produces engine-identical
relational output, the property that matters before trusting it with logic
SQL can't express.

Scale shape: a UDTF is a narrow per-partition operator (no shuffle); its
Python cost is the per-batch pickle boundary — acceptable for row-expanding
transforms, never for per-row scalar math (use pandas_udf there).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"[.!?]+")


@udtf(returnType="sent_idx int, sentence string")
class SentenceSplit:
    """Split one document's text on sentence punctuation; emit one row per
    non-empty trimmed sentence with its 0-based index."""

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for raw in _SENT_RE.split(text):
            s = raw.strip()
            if s:
                yield idx, s
                idx += 1


def sentence_split(docs: DataFrame) -> DataFrame:
    """(doc_id, sent_idx, sentence) via ``LATERAL sentence_split(text)`` —
    the SQL form is the one registration surface Spark 4 exposes for UDTFs
    (documents with NULL text emit no rows, matching the oracle's unnest)."""
    spark = docs.sparkSession
    spark.udtf.register("sentence_split", SentenceSplit)
    docs.select("doc_id", "text").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.sentence
        FROM __udtf_docs, LATERAL sentence_split(text) s
        ORDER BY doc_id, sent_idx
        """
    )


SENTENCE_SPLIT_SQL = r"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY part_idx) - 1
                AS INT) AS sent_idx,
           sentence
    FROM (
        SELECT doc_id, part_idx, trim(part) AS sentence
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(text, '[.!?]+')) AS part,
                   generate_subscripts(string_split_regex(text, '[.!?]+'), 1)
                       AS part_idx
            FROM documents
        )
        WHERE trim(part) <> ''
    )
    ORDER BY doc_id, sent_idx
"""
