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


_TOPK_N = 3


class TopTokensWide:
    """POLYMORPHIC UDTF (Spark 4 ``analyze``): output schema computed at
    PLAN time from the constant k argument — (doc_id, tok_1..tok_k).
    The dynamic-schema path is what static ``returnType`` UDTFs cannot
    express: the same class serves any k without code changes, the
    engine resolving the schema per call site.  Ties break (count DESC,
    token ASC); docs with fewer than k distinct tokens pad with NULLs;
    tokenization is the engine-portable regex shared with the text ops."""

    @staticmethod
    def analyze(doc_id, text, k):
        from pyspark.sql.types import LongType, StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        n = int(k.value)
        schema = StructType().add("doc_id", LongType())
        for i in range(n):
            schema = schema.add(f"tok_{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, doc_id: int, text: str, k: int):
        import re
        from collections import Counter

        toks = [t for t in re.sub(r"[^a-z0-9 ]", "", (text or "").lower()).split() if t]
        top = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        yield (doc_id, *[t for t, _ in top], *([None] * (k - len(top))))


def udtf_top_tokens_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k tokens AS COLUMNS through the polymorphic UDTF
    (k = 3 at this call site; the schema is resolved by ``analyze``)."""
    from pyspark.sql.functions import lit

    spark.udtf.register("top_tokens_wide", udtf(TopTokensWide))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf2")
    return spark.sql(
        f"""
        SELECT t.doc_id, t.tok_1, t.tok_2, t.tok_3
        FROM _docs_udtf2 d, LATERAL top_tokens_wide(d.doc_id, d.text, {_TOPK_N}) t
        """
    )


UDTF_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(list_filter(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +'), t -> t != '')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
), r AS (
  SELECT doc_id, tok, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok ASC) AS rk
  FROM c
), wide AS (
  SELECT doc_id,
         MAX(CASE WHEN rk = 1 THEN tok END) AS tok_1,
         MAX(CASE WHEN rk = 2 THEN tok END) AS tok_2,
         MAX(CASE WHEN rk = 3 THEN tok END) AS tok_3
  FROM r GROUP BY doc_id
)
SELECT d.doc_id, w.tok_1, w.tok_2, w.tok_3
FROM documents d LEFT JOIN wide w ON w.doc_id = d.doc_id
"""

QUERIES["udtf_top_tokens_wide"] = udtf_top_tokens_wide
ORACLE["udtf_top_tokens_wide"] = UDTF_TOPK_SQL


class LangProfile:
    """TABLE-ARGUMENT UDTF (Spark 4 ``TABLE(...) PARTITION BY``): the
    engine hash-partitions the input table by lang and feeds each
    partition's rows to ONE class instance — eval() accumulates, the
    single terminate() emits the partition summary.  This is the
    custom-aggregation API a built-in agg cannot express (arbitrary
    Python state per group), with the engine owning the shuffle; state
    is O(1) per partition.  Cite: reference has no UDF surface at all
    (psycopg2/confluent-kafka glue only); this is the Spark-native
    extension point."""

    def __init__(self) -> None:
        self._lang = None
        self._n = 0
        self._toks = 0
        self._maxc = 0

    def eval(self, row) -> None:  # noqa: D102 - contract is the class doc
        self._lang = row["lang"]
        self._n += 1
        t = row["text"]
        if t is not None:
            self._toks += len(t.split())
            self._maxc = max(self._maxc, len(t))

    def terminate(self):  # noqa: D102
        if self._n:
            yield (self._lang, self._n, self._toks, self._maxc)


def udtf_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile through the TABLE-argument UDTF: the
    SQL call site is ``lang_profile(TABLE(docs) PARTITION BY lang)`` —
    the engine shuffles, the class aggregates."""
    spark.udtf.register(
        "lang_profile",
        udtf(LangProfile, returnType="lang string, n_docs bigint, n_tokens bigint, max_chars bigint"),
    )
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf3")
    return spark.sql(
        "SELECT * FROM lang_profile(TABLE(_docs_udtf3) PARTITION BY lang)"
    )


UDTF_LANG_PROFILE_SQL = r"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN text IS NULL THEN 0
                ELSE LEN(list_filter(string_split_regex(text, '\s+'), t -> t != '')) END) AS BIGINT) AS n_tokens,
       CAST(COALESCE(MAX(LENGTH(text)), 0) AS BIGINT) AS max_chars
FROM documents GROUP BY lang
"""

QUERIES["udtf_lang_profile"] = udtf_lang_profile
ORACLE["udtf_lang_profile"] = UDTF_LANG_PROFILE_SQL
