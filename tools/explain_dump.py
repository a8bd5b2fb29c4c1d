"""Dump .explain("formatted") for named catalog queries to plans/r07/.

Usage: python tools/explain_dump.py <suffix> [query ...]

Writes plans/r07/<query>_<suffix>.txt for each query (default: the
bench.py timed lists). The judge reads these files to check plan-shape
claims in OPTIMIZATION_r07.md; capture them BEFORE and AFTER each
optimization (suffix "before" / "after").
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronominer_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench
        names = bench.BENCH_QUERIES + bench.BENCH_QUERIES_R4

    from chronominer_spark.queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("explain_dump")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython') + plan.count('ArrowEvalPython')}"
              " py-eval nodes)")
    spark.stop()


if __name__ == "__main__":
    main()
