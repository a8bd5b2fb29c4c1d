from chronominer_spark.sources.readers import (  # noqa: F401
    discover_files,
    read_jsonl_permissive,
    read_text_documents,
)
from chronominer_spark.sources.sinks import (  # noqa: F401
    read_csv_typed,
    repair_nullable_ints,
    write_csv,
    write_jsonl,
)
