"""Typed result sinks: CSV and JSONL with nullable-int discipline (S6).

Reference parity: ``/root/reference/modules/conversion/csv_converter.py:
136-144`` — before writing CSV the reference runs ``convert_dtypes()``
so integer columns that picked up NaN-induced float dtype render as
nullable ``Int64`` (``1651``), never ``1651.0``; files are written
``utf-8-sig`` so Excel detects the encoding.

The Spark analog has two halves:

- :func:`repair_nullable_ints` — a float/double column whose non-null
  values are all integral is cast back to ``bigint`` (one aggregate
  scan decides, mirroring pandas ``convert_dtypes`` inspecting values).
  This is the type repair for frames that round-tripped through a
  lossy stage (JSON inference, pandas UDFs) where nullable ints decay
  to doubles.
- :func:`write_csv` / :func:`write_jsonl` — distributed writers.
  Nulls render as empty CSV cells, so a repaired bigint column
  round-trips as bigint under schema inference. ``bom=True`` prepends
  the UTF-8 BOM to each part file (Excel's encoding sniff) — a
  driver-side post-pass, local/HDFS paths only, off by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FLOATY = (T.FloatType, T.DoubleType)


def integral_float_cols(df: DataFrame, cols: list[str] | None = None) -> list[str]:
    """The float/double columns of ``df`` whose non-null values are all
    integral (within exact float comparison) — one aggregate pass over
    the candidates, no collect of row data."""
    cands = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, _FLOATY) and (cols is None or f.name in cols)
    ]
    if not cands:
        return []
    checks = [
        F.max(
            F.when(F.col(c).isNotNull() & (F.col(c) != F.floor(F.col(c))), 1)
            .otherwise(0)
        ).alias(c)
        for c in cands
    ]
    row = df.agg(*checks).collect()[0]
    return [c for c in cands if (row[c] or 0) == 0]


def repair_nullable_ints(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Cast all-integral float/double columns to nullable bigint, the
    Spark version of the reference's ``convert_dtypes`` repair."""
    to_fix = set(integral_float_cols(df, cols))
    if not to_fix:
        return df
    return df.select(*[
        F.col(c).cast("long").alias(c) if c in to_fix else F.col(c)
        for c in df.columns
    ])


def write_csv(
    df: DataFrame, path: str,
    header: bool = True, repair_ints: bool = True,
    bom: bool = False, mode: str = "overwrite",
) -> None:
    """Distributed CSV sink with the reference's dtype discipline:
    integral doubles cast to bigint, nulls as empty cells (so nullable
    ints never render ``1651.0`` and re-read as bigint)."""
    if repair_ints:
        df = repair_nullable_ints(df)
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("emptyValue", "")
        .option("nullValue", "")
        .csv(path)
    )
    if bom:
        _prepend_bom(path)


def write_jsonl(
    df: DataFrame, path: str,
    repair_ints: bool = True, mode: str = "overwrite",
) -> None:
    """JSONL sink (Spark's json writer is line-delimited by nature —
    the reference's append-log format, one record per line)."""
    if repair_ints:
        df = repair_nullable_ints(df)
    df.write.mode(mode).json(path)


def read_csv_typed(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """Read back a :func:`write_csv` output; with no explicit schema,
    inference plus the empty-null convention restores bigint columns."""
    reader = spark.read.option("header", str(header).lower()) \
        .option("nullValue", "")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def _prepend_bom(path: str) -> None:
    """Prepend the UTF-8 BOM to every csv part file (driver-side,
    local-filesystem paths; the Excel-compat nicety of the reference's
    ``utf-8-sig`` writes)."""
    import glob
    import os

    root = path[7:] if path.startswith("file://") else path
    for part in glob.glob(os.path.join(root, "part-*.csv")):
        with open(part, "rb") as f:
            data = f.read()
        if not data.startswith(b"\xef\xbb\xbf"):
            with open(part, "wb") as f:
                f.write(b"\xef\xbb\xbf" + data)
            # the rewrite invalidates Hadoop's local-FS checksum sidecar
            crc = os.path.join(os.path.dirname(part),
                               "." + os.path.basename(part) + ".crc")
            if os.path.exists(crc):
                os.remove(crc)
