from search_engine_spark.functions.text import (  # noqa: F401
    analyze,
    analyze_batch,
    extract_text,
    porter_stem,
    stem_tokens,
    tokenize,
)
from search_engine_spark.functions.codec import (  # noqa: F401
    decode_postings,
    decode_varints,
    encode_postings,
    encode_varints,
)
