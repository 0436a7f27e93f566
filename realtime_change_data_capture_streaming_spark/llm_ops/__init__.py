"""LLM-training-data pipeline operators: dedup, similarity search,
multimodal columns, text analysis."""

from realtime_change_data_capture_streaming_spark.llm_ops import (
    adpcm,
    curation,
    dedup,
    features,
    flac,
    ml_lsh,
    multimodal,
    similarity,
    text,
    tiff,
    webp,
)

_MODULES = (text, dedup, similarity, multimodal, webp, flac, adpcm, tiff, ml_lsh, curation, features)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
