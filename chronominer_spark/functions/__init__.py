from chronominer_spark.functions.text import (  # noqa: F401
    levenshtein_ratio,
    normalize_text,
    strip_diacritics_udf,
)
from chronominer_spark.functions.keys import (  # noqa: F401
    build_custom_id,
    extract_chunk_index,
    fingerprint,
)
