"""Concurrent action submission — overlap independent Spark jobs.

The suite evaluator returns two lazy frames (results, violations) whose
plans share persisted intermediates but are otherwise independent.
Materializing them SEQUENTIALLY leaves the cluster idle during each
job's low-parallelism phases (final single-partition aggregates, output
commit); at high core counts that idle tail is a measurable slice of
suite wall (profiled at 8M turns / local[32]: ~4 s of a 36 s draw —
tools/profile_serial.py).

``run_concurrent`` submits each action from its own Python thread with
its own FAIR scheduler pool, so Spark interleaves the jobs' stages and
one job's tail overlaps the other's head. This is driver-side *job*
concurrency only — no shared mutable state beyond Spark's own
BlockManager (first computer of a persisted partition wins the store;
concurrent siblings may still DUPLICATE the compute before the block
lands).

MEASURED CAVEAT (round 6): for jobs that share not-yet-materialized
persisted frames, that duplicate compute is a real cost — the suite's
results+violations pair measured a ~9% LOSS at 80M turns (455 s
sequential vs 500 s overlapped, identical outputs) while the 8M gain
sat inside between-draw noise. The engine therefore materializes
results THEN violations by default (cache-populate-then-read) and this
helper is an opt-in (`CM_CONCURRENT_OUTPUTS=1` in bench.py) for job
pairs that share nothing or whose shares are already materialized.

Thread-safety note: PySpark pins each Python thread to a distinct JVM
thread (``PYSPARK_PIN_THREAD``, default on since 3.2), so
``setLocalProperty("spark.scheduler.pool", ...)`` set inside the worker
thread scopes to that thread's jobs only.
"""

from __future__ import annotations

import concurrent.futures
from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")


def run_concurrent(
    spark: SparkSession,
    jobs: dict[str, Callable[[], T]],
    pool_prefix: str = "cm",
) -> dict[str, T]:
    """Run each no-arg action concurrently, one FAIR pool per job.

    Returns {name: result}. The first exception (if any) propagates
    after all threads finish — a failed violations write must not be
    masked by a successful results write, and vice versa.

    With a single job this degrades to a plain call (no thread, no pool
    switch), so callers can use it unconditionally.
    """
    if len(jobs) == 1:
        (name, fn), = jobs.items()
        return {name: fn()}

    sc = spark.sparkContext

    def _in_pool(name: str, fn: Callable[[], T]) -> T:
        sc.setLocalProperty("spark.scheduler.pool", f"{pool_prefix}_{name}")
        try:
            return fn()
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with concurrent.futures.ThreadPoolExecutor(len(jobs)) as ex:
        futs = {name: ex.submit(_in_pool, name, fn)
                for name, fn in jobs.items()}
        # wait for ALL before raising: concurrent.futures cancels nothing
        # once running, and a half-finished sibling write must complete
        # (or fail on its own) before the caller sees the error
        done = {name: f for name, f in futs.items()}
        results: dict[str, T] = {}
        first_err: BaseException | None = None
        for name, f in done.items():
            try:
                results[name] = f.result()
            except BaseException as e:  # noqa: BLE001 - re-raised below
                if first_err is None:
                    first_err = e
        if first_err is not None:
            raise first_err
        return results
