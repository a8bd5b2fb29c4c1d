"""chronominer_spark — a from-scratch PySpark-native schema + constraint
validation engine with the query/data-processing capabilities of
Paullllllllllllllllll/ChronoMiner (reference at /root/reference, read-only).

NOT a port: the reference is a Python CLI that extracts structured records
from historical documents with LLMs; this engine re-expresses its
data-validation / dataset-assembly semantics (schema constraints, key
uniqueness, merge/dedup/ordering, checkpoint-resume, evaluation metrics,
multi-key accounting) as declarative constraint suites evaluated with the
PySpark DataFrame API over snapshot-versioned tables of multi-turn
transcripts — designed for 10^12-turn scale, tested on local[32].

Layout
------
- ``session``      SparkSession builders (local test / bench / submit)
- ``tables``       snapshot-versioned parquet tables (Iceberg-like commits)
- ``datagen``      deterministic synthetic transcripts generator
- ``constraints``  the constraint-suite engine (specs + evaluation)
- ``checkpoint``   fingerprint-chained resume manifest
- ``runner``       driver loop: plan -> skip completed -> run -> commit
- ``functions``    scalar/text functions (normalization, keys, fingerprints)
- ``operators``    dataset-assembly operators (merge/dedup/align/topk) and
                   training-data-pipeline ops (minhash-LSH, simhash, ANN,
                   lang-id, quality scoring, multimodal plumbing)
- ``streaming``    incremental validation over micro-batches
"""

__version__ = "0.1.0"
