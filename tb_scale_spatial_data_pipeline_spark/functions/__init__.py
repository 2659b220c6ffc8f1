from .indices import ndvi, ndwi, ndre, contrast_stretch
from .sentinels import NODATA_OUT, sentinel_to_null, null_to_sentinel, is_nodata
from .signatures import combo_signature, hashed_model_key
from .text import (
    token_count,
    word_tokens,
    lang_id_heuristic,
    quality_score,
    doc_fingerprint,
    shingles,
)
from .vectors import cosine_similarity, dot, l2_norm, l2_distance

__all__ = [
    "ndvi",
    "ndwi",
    "ndre",
    "contrast_stretch",
    "NODATA_OUT",
    "sentinel_to_null",
    "null_to_sentinel",
    "is_nodata",
    "combo_signature",
    "hashed_model_key",
    "token_count",
    "word_tokens",
    "lang_id_heuristic",
    "quality_score",
    "doc_fingerprint",
    "shingles",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "l2_distance",
]
