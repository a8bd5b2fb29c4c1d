"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count + column names + order-insensitive value hash.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def frame_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256(repr(canon).encode())
    return h.hexdigest()[:16]


def _norm(v):
    """Type-sensitive normalization mirroring the driver: an integral
    float stays '3665.0' (so a DuckDB HUGEINT fetched as float64 through
    pandas does NOT hash-match a Spark BIGINT 3665)."""
    if isinstance(v, bool):
        return str(v)
    try:
        import numpy as np
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.floating):
            v = float(v)
    except ImportError:
        pass
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(v)
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from chronominer_spark.queries import ORACLES, QUERIES
    from chronominer_spark.session import build_session

    spark = build_session("parity", master="local[8]",
                          extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tb in TABLES:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'"
        )

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:140]}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            # fetch through pandas like the driver does: DuckDB HUGEINT
            # arrives as float64, exposing oracle-type mismatches that
            # fetchall() (native Python ints) would hide
            odf = con.execute(ORACLES[name]).df()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {str(e)[:140]}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            hs = frame_hash([tuple(r) for r in srows], scols)
            ho = frame_hash(orows, ocols)
            if hs != ho:
                problems.append(f"valuehash spark={hs} duck={ho}")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(srows)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
