"""Python UDTF surface (Spark 4): table-valued functions in the FROM
clause — the row-expanding complement to the pandas-UDF column surface
(SURVEY.md §2.5 "UDTF-ish").

Scale notes: a Python UDTF runs one Python worker per task over Arrow
batches; the lateral join keeps it embarrassingly parallel (no shuffle —
each input partition expands independently).  Hot paths should still
prefer codegen (explode/posexplode); a UDTF earns its cost when the
expansion logic is genuinely procedural, like the regex sentence splitter
here.  The split regex avoids lookbehind so the DuckDB oracle (RE2) can
run the identical pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from realtime_change_data_capture_streaming_spark.sources.tables import load_table

_SENTENCE_RE = r"[.!?]+\s+"


@udtf(returnType="sentence_idx int, sentence string, n_tokens int")
class SplitSentences:
    """text -> one row per sentence with its 1-based position and
    whitespace token count."""

    def eval(self, text: str):  # noqa: D102 - contract is the class doc
        import re

        for i, part in enumerate(
            (p for p in re.split(_SENTENCE_RE, text or "") if p), start=1
        ):
            yield i, part, len(part.split())


def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents lateral-joined through the sentence-splitter UDTF; capped
    to sentences of the first 200 docs so the driver compare stays small."""
    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_tokens
        FROM (SELECT * FROM _docs_udtf WHERE doc_id < 200) d,
             LATERAL split_sentences(d.text) s
        """
    )


UDTF_SENTENCES_SQL = rf"""
WITH parts AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '{_SENTENCE_RE}'), p -> p != '') AS ps
  FROM documents WHERE doc_id < 200
),
exploded AS (
  SELECT doc_id,
         CAST(unnest(range(1, len(ps) + 1)) AS INT) AS sentence_idx,
         unnest(ps) AS sentence
  FROM parts
)
SELECT doc_id, sentence_idx, sentence,
       CAST(len(list_filter(string_split_regex(sentence, '\s+'), t -> t != '')) AS INT)
         AS n_tokens
FROM exploded
"""

QUERIES = {"udtf_split_sentences": udtf_split_sentences}
ORACLE = {"udtf_split_sentences": UDTF_SENTENCES_SQL}
