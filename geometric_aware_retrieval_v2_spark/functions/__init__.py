from geometric_aware_retrieval_v2_spark.functions.tokenizer import (
    tokenize_terms,
    tokenize_terms_arrow,
    doc_stats,
)
from geometric_aware_retrieval_v2_spark.functions.varbyte import (
    varbyte_encode,
    varbyte_decode,
    encode_postings_block,
    decode_postings_block,
)

__all__ = [
    "tokenize_terms",
    "tokenize_terms_arrow",
    "doc_stats",
    "varbyte_encode",
    "varbyte_decode",
    "encode_postings_block",
    "decode_postings_block",
]
