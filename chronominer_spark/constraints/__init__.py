"""Declarative constraint suites over transcript tables.

The suite registry is the Spark-native analog of ChronoMiner's schema
registry (``/root/reference/modules/extract/schema_handlers.py:35-65``):
a named, versioned, hashable declaration of every check to run, dispatched
to vectorized DataFrame evaluation plans.
"""

from chronominer_spark.constraints.spec import (  # noqa: F401
    Constraint,
    ConstraintSuite,
    cast_ok,
    column_stats,
    cross_field_null,
    drift_ks,
    drift_psi,
    group_stats,
    in_range,
    matches,
    not_empty,
    not_null,
    quantiles,
    referential,
    text_equality,
    unique,
)
from chronominer_spark.constraints.engine import SuiteEvaluator  # noqa: F401
