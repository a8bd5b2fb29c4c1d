"""Dataset-assembly operators: merge, dedup, alignment, ordering, top-k.

Reference parity (SURVEY.md §2.3/§2.5/§2.6):

- :func:`merge_new_wins`      J3  ``modules/extract/file_processor.py:1459-1518``,
                                  ``modules/extract/batch_output.py:209-324``
- :func:`last_wins_dedup`     W3  ``modules/extract/batch_output.py:108-128``
- :func:`full_outer_align`    J2  ``eval/jsonl_eval.py:366-395``
- :func:`sessionize`          A9  ``modules/infra/chunking.py:147-187`` (the
                                  running-sum-with-reset chunker generalized
                                  to gap sessionization)
- :func:`top_k_per_group`     L2  ``eval/metrics.py:354-376``

Scale notes: every operator here is a pure DataFrame plan — joins hash on
the key (AQE picks broadcast for small sides), windows partition by the
group key, nothing collects. ``merge_new_wins`` uses a full-outer join +
coalesce rather than union+window so the common case (small update overlay
onto a big base) broadcasts the update side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_new_wins(
    base: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """Overlay ``updates`` onto ``base`` keyed by ``keys``: a key present
    in both takes the update's non-key columns; keys present in only one
    side pass through. The Spark analog of merging fresh records onto
    prior output with new-wins semantics."""
    value_cols = [c for c in base.columns if c not in keys]
    b = base.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in value_cols])
    u = updates.select(*keys, *[F.col(c).alias(f"__u_{c}") for c in value_cols])
    joined = b.join(u, on=keys, how="full_outer")
    out_cols = [F.col(k) for k in keys] + [
        F.coalesce(F.col(f"__u_{c}"), F.col(f"__b_{c}")).alias(c)
        for c in value_cols
    ]
    return joined.select(*out_cols)


def last_wins_dedup(
    df: DataFrame, keys: list[str], order_by: list, keep: str = "last"
) -> DataFrame:
    """One row per key, the winner chosen by ``order_by`` (descending for
    ``keep='last'``). ``order_by`` must define a total order within key
    groups or the result is parallelism-sensitive — pass a tiebreak
    column (the reference hit this same class of bug; SURVEY.md §7.4).

    ONE hash aggregate: ``max(struct(order..., payload))`` per key
    (``min`` for ``keep='first'``) — lexicographic struct comparison
    realizes the all-desc/all-asc total order, groups collapse map-side,
    and no sort exchange ships full rows (vs the ``row_number`` window,
    whose per-key sort over wide payloads is the scale bottleneck; the
    struct-agg collapse measured 3× on the equality engine). On exact
    order-key ties the payload fields break the tie deterministically
    (the window left the pick arbitrary). Unorderable columns (maps)
    fall back to the window plan."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    from pyspark.sql.types import MapType
    if any(isinstance(f.dataType, MapType) for f in df.schema.fields):
        ordering = ([c.desc() for c in cols] if keep == "last"
                    else [c.asc() for c in cols])
        w = W.partitionBy(*keys).orderBy(*ordering)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    payload = [c for c in df.columns if c not in keys]
    packed = F.struct(
        *[c.alias(f"__o{i}") for i, c in enumerate(cols)],
        *[F.col(c) for c in payload],
    )
    aggfn = F.max if keep == "last" else F.min
    won = df.groupBy(*keys).agg(aggfn(packed).alias("__w"))
    return won.select(
        *[F.col(c) if c in keys else F.col(f"__w.{c}").alias(c)
          for c in df.columns]
    )


def full_outer_align(
    left: DataFrame, right: DataFrame, keys: list[str],
    left_name: str = "left", right_name: str = "right",
) -> DataFrame:
    """Align two keyed datasets; either side may be missing. Adds a
    ``presence`` column in {'both', '<left_name>_only', '<right_name>_only'}."""
    l_marked = left.withColumn("__l", F.lit(1))
    r_marked = right.withColumn("__r", F.lit(1))
    joined = l_marked.join(r_marked, on=keys, how="full_outer")
    presence = (
        F.when(F.col("__l").isNotNull() & F.col("__r").isNotNull(), F.lit("both"))
        .when(F.col("__l").isNotNull(), F.lit(f"{left_name}_only"))
        .otherwise(F.lit(f"{right_name}_only"))
    )
    return joined.withColumn("presence", presence).drop("__l", "__r")


def sessionize(
    df: DataFrame, key: str, ts: str, gap_seconds: int
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. Carry-dependent running
    state expressed as lag + conditional cumsum — stays in whole-stage
    codegen, no Python. Adds ``session_id`` (1-based per key)."""
    w = W.partitionBy(key).orderBy(F.col(ts).asc())
    # cast through timestamp first: TIMESTAMP_NTZ has no direct long cast
    epoch = F.col(ts).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_by: list, k: int
) -> DataFrame:
    """Rank-1..k selection per group with explicit total order (pass a
    tiebreak in ``order_by``). Adds ``rank``."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = W.partitionBy(*group_cols).orderBy(*cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
