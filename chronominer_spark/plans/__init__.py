from chronominer_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    physical_plan,
    pushed_filters,
    scan_columns,
    uses_broadcast_join,
)
