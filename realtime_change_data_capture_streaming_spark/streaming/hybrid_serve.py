"""Hybrid retrieval served from the MAINTAINED indexes: the r13 hybrid
fusion (``llm_ops/text.py::hybrid_lexical_vector_topk``) re-pointed at
the two streaming-maintained tiers, closing the serving story —

- the LEXICAL side ranks off the stream-maintained BM25 inverted index
  (``streaming/bm25_maintain.py``: postings appended across real
  micro-batches, counters in the manifest, bucket-pruned serving scan);
- the VECTOR side ranks off the stream-maintained IVF+PQ codes store
  (``streaming/ann_maintain.py``: frozen quantizers, cluster-mapped
  appends), scored by the exact fixed-point ADC distance over the
  32x-compressed codes — the production vector tier, not a
  full-precision rescan;
- reciprocal-rank fusion joins two ``_RRF_SHORTLIST``-row shortlists,
  so the fused join is shortlist x shortlist at any corpus size.

Correctness: the maintained BM25 serves scores IDENTICAL to the
from-scratch build (``BM25_SQL``'s ``per_doc`` chain), and the
maintained codes equal the frozen-quantizer closed form
(``_stream_ann_sql``'s chains) — so the whole fusion replays in DuckDB
from those two proven chains plus the shared RRF arithmetic.

At 100 TB: lexical I/O is q/64 of the postings; vector I/O is the code
table (M bytes/vector); both indexes keep serving THROUGH ingestion
(the maintenance loops' auto-compaction bounds their file counts); the
fusion itself never sees the corpus.

Reference parity note: the reference repo has no retrieval surface (a
6-file CDC demo); this is the capstone of the §2.5 LLM-data-pipeline
extension's retrieval tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.llm_ops.similarity import N_PQ_CODES, _adc_lut, _subvectors
from realtime_change_data_capture_streaming_spark.llm_ops.text import (
    _BM25_CHAIN_SQL,
    _bm25_chain_sql,
    _BM25_TOP,
    _HYBRID_QUERY_VEC,
    _RRF_K,
    _RRF_SHORTLIST,
    _ranked_shortlist,
)
from realtime_change_data_capture_streaming_spark.session import scratch_dir
from realtime_change_data_capture_streaming_spark.sources.tables import load_table
from realtime_change_data_capture_streaming_spark.streaming.ann_maintain import (
    ANN_HISTORY_MAX_VEC_ID,
    _load_frozen,
    _read_erased_vecs,
    _read_store,
    _run_forget_stream,
    _run_ingest_stream,
    _sql_pq_assign,
    _stream_ann_index_dir,
)
from realtime_change_data_capture_streaming_spark.streaming.bm25_maintain import (
    _run_bm25_cdc_stream,
    _run_bm25_stream,
    _serve_doc_scores,
)

#: erasure fixture predicate for the hybrid forget capstone: ids with
#: ``id % 3 == 1`` are deleted on BOTH tiers (documents from the BM25
#: loop, vectors from the ANN loop — the fixture treats doc_id and
#: vec_id as one id space).  Residue 1, not 0: the fixed query vector
#: (``_HYBRID_QUERY_VEC = 0``) must survive as the probe.
HYBRID_FORGET_MOD = 3
HYBRID_FORGET_RESIDUE = 1


def _vec_rank_from_codes(spark: SparkSession, sf_dir: str, cb: DataFrame, codes: DataFrame) -> DataFrame:
    """ADC vector shortlist off maintained code rows: rank every code
    row against the fixed query vector's LUT — reads codes only, never
    vectors."""
    e = load_table(spark, sf_dir, "embeddings")
    qsubs = _subvectors(e.filter(F.col("vec_id") == _HYBRID_QUERY_VEC).limit(1))
    lut = _adc_lut(qsubs, cb)
    vscored = (
        codes.filter(F.col("vec_id") != _HYBRID_QUERY_VEC)
        .join(F.broadcast(lut.select("s", "code", "pfp")), ["s", "code"])
        .groupBy(F.col("vec_id").alias("doc_id"))
        .agg(F.sum("pfp").alias("fp"))
    )
    # ADC is a DISTANCE: smaller is better — negate so the shared
    # desc-ordered shortlist helper ranks ascending distance
    return _ranked_shortlist(
        vscored.select("doc_id", (-F.col("fp")).alias("negfp")), "negfp", "rank_vec"
    )


def _fuse_and_rank(lex: DataFrame, vec: DataFrame) -> DataFrame:
    """The shared RRF fusion tail: shortlist x shortlist full-outer
    join, reciprocal-rank sum, global top-k."""
    from pyspark.sql import Window

    fused = lex.join(vec, "doc_id", "full_outer")
    rl = F.coalesce(F.col("rank_lex"), F.lit(_RRF_SHORTLIST + 1))
    rv = F.coalesce(F.col("rank_vec"), F.lit(_RRF_SHORTLIST + 1))
    rrf = F.lit(1.0) / (F.lit(_RRF_K) + rl) + F.lit(1.0) / (F.lit(_RRF_K) + rv)
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    top = (
        fused.withColumn("rrf", F.round(rrf, 8))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_BM25_TOP)
    )
    return top.withColumn("rk", F.row_number().over(w)).select(
        "doc_id",
        F.col("rank_lex").cast("bigint").alias("rank_lex"),
        F.col("rank_vec").cast("bigint").alias("rank_vec"),
        "rrf",
        F.col("rk").cast("bigint").alias("rk"),
    )


def stream_hybrid_maintained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF top-k where BOTH sides serve from indexes that were BUILT BY
    STREAMS this run: maintained-BM25 lexical ranks fused with
    maintained-ANN ADC vector ranks for the fixed query vector."""
    # lexical: the BM25 maintenance loop (doc-parity micro-batches),
    # then the bucket-pruned per-doc scores
    work = scratch_dir(prefix="hybridmaint_")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = _run_bm25_stream(
        spark,
        [
            d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0),
            d.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1),
        ],
        work,
    )
    per_doc = _serve_doc_scores(spark, paths["postings"], paths["stats"])
    lex = _ranked_shortlist(per_doc, "s_fp", "rank_lex")

    # vector: the ANN maintenance loop (frozen quantizers + vec-parity
    # micro-batches)
    root = _stream_ann_index_dir(spark, sf_dir)
    cents, cb, base = _load_frozen(spark, root)
    _w, store = _run_ingest_stream(spark, sf_dir, cents, cb)
    codes = base.select("vec_id", "s", "code").unionByName(
        _read_store(spark, store).select("vec_id", "s", "code")
    )
    return _fuse_and_rank(lex, _vec_rank_from_codes(spark, sf_dir, cb, codes))


def stream_hybrid_forget_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure through the WHOLE retrieval stack (the r15 capstone): CDC
    deletes flow through BOTH maintenance loops — the BM25 loop erases
    documents (set + correction counters in one manifest flip), the ANN
    loop tombstones the same ids' vectors — and the hybrid RRF fusion
    must equal the closed form over the SURVIVING corpus on both legs:
    lexical ranks shift with the corrected n_docs/avgdl/df, vector ranks
    lose the tombstoned candidates, and no erased id can reach the fused
    top-k through EITHER leg."""
    work = scratch_dir(prefix="hybridforget_")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ins = d.withColumn("op", F.lit("c"))
    dels = d.filter(
        F.pmod(F.col("doc_id"), F.lit(HYBRID_FORGET_MOD)) == HYBRID_FORGET_RESIDUE
    ).select("doc_id", F.lit(None).cast("string").alias("text"), F.lit("d").alias("op"))
    paths = _run_bm25_cdc_stream(
        spark,
        [
            ins.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0),
            ins.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1),
            dels,
        ],
        work,
    )
    per_doc = _serve_doc_scores(
        spark, paths["postings"], paths["stats"], paths["erased"]
    )
    lex = _ranked_shortlist(per_doc, "s_fp", "rank_lex")

    root = _stream_ann_index_dir(spark, sf_dir)
    cents, cb, base = _load_frozen(spark, root)
    store, erased_root = _run_forget_stream(
        spark,
        sf_dir,
        cents,
        cb,
        f"{work}/ann",
        F.pmod(F.col("vec_id"), F.lit(HYBRID_FORGET_MOD)) == HYBRID_FORGET_RESIDUE,
    )
    codes = base.select("vec_id", "s", "code").unionByName(
        _read_store(spark, store).select("vec_id", "s", "code")
    )
    erased = _read_erased_vecs(spark, erased_root)
    if erased is not None:
        codes = codes.join(F.broadcast(erased), "vec_id", "left_anti")
    return _fuse_and_rank(lex, _vec_rank_from_codes(spark, sf_dir, cb, codes))


def _maintained_hybrid_sql(forget: bool = False) -> str:
    """DuckDB replay: the from-scratch BM25 ``per_doc`` chain (the
    maintained index provably serves the identical scores), the
    history-fit frozen PQ chain with the frozen assignment of BOTH
    splits (the maintained codes' closed form), the query vector's ADC
    LUT, and the shared RRF fusion arithmetic.  With ``forget``, both
    legs run over the SURVIVING corpus (documents/vectors minus the
    ``id % HYBRID_FORGET_MOD == HYBRID_FORGET_RESIDUE`` erasure set) —
    the clean rebuild the erased maintained indexes must reproduce."""
    from realtime_change_data_capture_streaming_spark.llm_ops.similarity import (
        N_PQ_SUB,
        PQ_ITERS,
        PQ_SUB_DIM,
        _ADC_SCALE,
    )
    from realtime_change_data_capture_streaming_spark.streaming.ann_maintain import (
        _PQ_DIST,
        _sql_pq_update,
    )

    HIST = ANN_HISTORY_MAX_VEC_ID
    QV = _HYBRID_QUERY_VEC
    chain = _BM25_CHAIN_SQL
    if forget:
        chain = (
            f"WITH live_docs AS (SELECT doc_id, text FROM documents "
            f"WHERE doc_id % {HYBRID_FORGET_MOD} != {HYBRID_FORGET_RESIDUE})"
            + _bm25_chain_sql("live_docs", lead=",")
        )
    vec_erase = (
        f" AND v.vec_id % {HYBRID_FORGET_MOD} != {HYBRID_FORGET_RESIDUE}" if forget else ""
    )
    sql = f"""{chain}, lex AS (
  SELECT doc_id, rank_lex FROM (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY s_fp DESC, doc_id ASC) AS BIGINT) AS rank_lex
    FROM per_doc
  ) WHERE rank_lex <= {_RRF_SHORTLIST}
), vd AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), hsubs AS MATERIALIZED (
  SELECT vec_id, t.s AS s, list_slice(v, t.s * {PQ_SUB_DIM} + 1, t.s * {PQ_SUB_DIM} + {PQ_SUB_DIM}) AS sub
  FROM vd, UNNEST(range(0, {N_PQ_SUB})) AS t(s)
  WHERE vec_id < {HIST}
), isubs AS (
  SELECT vec_id, t.s AS s, list_slice(v, t.s * {PQ_SUB_DIM} + 1, t.s * {PQ_SUB_DIM} + {PQ_SUB_DIM}) AS sub
  FROM vd, UNNEST(range(0, {N_PQ_SUB})) AS t(s)
  WHERE vec_id >= {HIST}
), cb0 AS (
  SELECT s, vec_id AS code, sub AS cw FROM hsubs WHERE vec_id < {N_PQ_CODES}
)"""
    cbn = "cb0"
    for i in range(PQ_ITERS):
        sql += (
            f", {_sql_pq_assign('hsubs', cbn, f'hpassign{i}')}\n"
            f", {_sql_pq_update(f'hpassign{i}', f'hcb{i + 1}')}"
        )
        cbn = f"hcb{i + 1}"
    sql += f"""
, {_sql_pq_assign("hsubs", cbn, "hcodes")}
, {_sql_pq_assign("isubs", cbn, "icodes")}
, qlut AS (
  SELECT a.s, c.code, CAST(FLOOR({_PQ_DIST} * {float(_ADC_SCALE)}) AS BIGINT) AS pfp
  FROM (SELECT s, sub FROM hsubs WHERE vec_id = {QV}) a JOIN {cbn} c ON a.s = c.s
), vscored AS (
  SELECT v.vec_id AS doc_id, SUM(l.pfp) AS fp
  FROM (SELECT vec_id, s, code FROM hcodes UNION ALL SELECT vec_id, s, code FROM icodes) v
  JOIN qlut l ON l.s = v.s AND l.code = v.code
  WHERE v.vec_id != {QV}{vec_erase}
  GROUP BY 1
), vec AS (
  SELECT doc_id, rank_vec FROM (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY fp ASC, doc_id ASC) AS BIGINT) AS rank_vec
    FROM vscored
  ) WHERE rank_vec <= {_RRF_SHORTLIST}
), fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex.rank_lex, vec.rank_vec,
         ROUND(1.0 / ({_RRF_K} + COALESCE(lex.rank_lex, {_RRF_SHORTLIST} + 1))
             + 1.0 / ({_RRF_K} + COALESCE(vec.rank_vec, {_RRF_SHORTLIST} + 1)), 8) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
)
SELECT doc_id, rank_lex, rank_vec, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rk
FROM fused
ORDER BY rrf DESC, doc_id ASC
LIMIT {_BM25_TOP}
"""
    return sql


QUERIES = {
    "stream_hybrid_maintained_topk": stream_hybrid_maintained_topk,
    "stream_hybrid_forget_topk": stream_hybrid_forget_topk,
}
ORACLE = {
    "stream_hybrid_maintained_topk": _maintained_hybrid_sql(),
    "stream_hybrid_forget_topk": _maintained_hybrid_sql(forget=True),
}
