"""Deterministic 10x upsample of an sf directory for MEASUREMENT only.

The driver's round-end bench may run at a larger, driver-generated
scale factor (BENCH_r06 recorded sf=1.0) that is not on disk in this
sandbox. This tool replicates /root/testdata/sf0.1 10x with
key-offsets so per-query timings can be taken at a representative
scale: key columns are shifted per replica (join relationships
preserved replica-locally and globally consistent), text content is
suffixed per replica (so the dedup/LSH families do not see an
artificial 10x exact-duplicate corpus), and embeddings are slightly
perturbed per replica. Output distributions are not identical to the
driver's true sf1.0 generator — relative timings are the point, not
absolute parity. Never used by any query path or bench.py itself.

Usage: python tools/upsample_sf.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sf1.0 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

# key columns offset per replica by replica * span (span = power of 10
# above the max observed key, so replica keyspaces never collide)
KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}
# small dims are NOT replicated (they are referenced by nationkey etc.
# which we leave untouched)
NO_REPLICATE = {"nation", "region"}
TEXT_COLS = {"documents": ["text"]}


def span_for(s: pd.Series) -> int:
    m = int(s.max())
    p = 1
    while p <= m:
        p *= 10
    return p


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for tbl, keys in KEYS.items():
        df = pd.read_parquet(f"{src}/{tbl}.parquet")
        if tbl in NO_REPLICATE:
            df.to_parquet(f"{dst}/{tbl}.parquet", index=False)
            print(f"{tbl}: copied {len(df)}")
            continue
        spans = {k: span_for(df[k]) for k in keys}
        reps = []
        for r in range(factor):
            d = df.copy()
            for k in keys:
                d[k] = d[k] + r * spans[k]
            for tc in TEXT_COLS.get(tbl, []):
                if r > 0:
                    # suffix EVERY WORD per replica: a bijection on the
                    # token vocabulary, so within-replica shingle/dup
                    # structure is preserved exactly while cross-replica
                    # similarity drops to zero (a trailing doc-level
                    # token would make every doc a ~0.95-Jaccard
                    # near-dup of its 9 replicas — degenerate for the
                    # LSH/dedup families)
                    sfx = f"r{r}"
                    d[tc] = d[tc].map(
                        lambda s: None if s is None else " ".join(
                            w + sfx for w in str(s).split())
                    ).astype(df[tc].dtype)
            if tbl == "embeddings" and r > 0:
                # replicas get INDEPENDENT unit vectors (same dim/norm
                # as the originals): tiny per-replica noise would make
                # every vector a near-dup of its 9 replicas — a
                # degenerate LSH workload with unstable hot buckets,
                # nothing like an organically random corpus
                rng = np.random.default_rng(1000 + r)
                dim = len(d["embedding"].iloc[0])
                mat = rng.normal(0, 1, (len(d), dim)).astype(np.float32)
                mat /= np.linalg.norm(mat, axis=1, keepdims=True)
                d["embedding"] = [row.tolist() for row in mat]
            reps.append(d)
        out = pd.concat(reps, ignore_index=True)
        # write with the SOURCE file's arrow schema so element types
        # (e.g. list<float>) survive the pandas round-trip
        import pyarrow as pa
        import pyarrow.parquet as pq
        schema = pq.read_schema(f"{src}/{tbl}.parquet")
        schema = pa.schema([schema.field(i) for i in range(len(schema.names))])
        table = pa.Table.from_pandas(out, schema=schema,
                                     preserve_index=False)
        pq.write_table(table, f"{dst}/{tbl}.parquet")
        print(f"{tbl}: {len(df)} -> {len(out)}")
    open(f"{dst}/_DONE", "w").close()


if __name__ == "__main__":
    main()
