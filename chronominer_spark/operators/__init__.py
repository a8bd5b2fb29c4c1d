"""Dataset-assembly and pipeline operators.

Two groups:

1. Re-expressions of the reference's merge/dedup/ordering/eval operators
   (SURVEY.md §2.3–§2.7) as DataFrame plans.
2. Large-scale training-data-pipeline operators (dedup families, ANN
   similarity, text analysis, multimodal plumbing) built on the same
   primitives.
"""

from chronominer_spark.operators.assembly import (  # noqa: F401
    full_outer_align,
    last_wins_dedup,
    merge_new_wins,
    sessionize,
    top_k_per_group,
)
from chronominer_spark.operators.evalmetrics import field_metrics  # noqa: F401
