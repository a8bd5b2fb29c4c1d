from chronominer_spark.sources.readers import (  # noqa: F401
    discover_files,
    read_jsonl_permissive,
    read_text_documents,
)
