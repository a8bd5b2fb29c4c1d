"""Snapshot / compare full query outputs for output-identity A/B.

Usage:
    python tools/ab_snapshot.py dump <tag> <sf_dir> <query> [query ...]
    python tools/ab_snapshot.py cmp  <tag_a> <tag_b> <sf_dir> <query> ...

``dump`` writes sorted rows of each query to
/tmp/ab_r07/<tag>/<sfname>_<query>.json; ``cmp`` diffs two tags row by
row and reports identical / first divergence. Used to prove that an
optimization left a declared query's output byte-identical (the
"prove equivalence with the oracle before moving on" requirement, at
the SFs the oracle gate does not cover).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rows(spark, name: str, sf_dir: str) -> list:
    from chronominer_spark.queries import QUERIES
    df = QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)
    out = sorted(
        tuple(repr(r[c]) for c in cols) for r in df.collect()
    )
    return [cols, out]


def main() -> int:
    mode = sys.argv[1]
    root = "/tmp/ab_r07"
    if mode == "dump":
        tag, sf_dir = sys.argv[2], sys.argv[3]
        names = sys.argv[4:]
        from chronominer_spark.session import build_session
        spark = build_session("ab_snapshot")
        os.makedirs(f"{root}/{tag}", exist_ok=True)
        sfn = os.path.basename(sf_dir.rstrip("/"))
        for name in names:
            cols, rows = _rows(spark, name, sf_dir)
            with open(f"{root}/{tag}/{sfn}_{name}.json", "w") as f:
                json.dump({"cols": cols, "rows": rows}, f)
            print(f"dumped {tag}/{sfn}_{name}: {len(rows)} rows")
        spark.stop()
        return 0
    if mode == "cmp":
        ta, tb, sf_dir = sys.argv[2], sys.argv[3], sys.argv[4]
        names = sys.argv[5:]
        sfn = os.path.basename(sf_dir.rstrip("/"))
        rc = 0
        for name in names:
            fa = f"{root}/{ta}/{sfn}_{name}.json"
            fb = f"{root}/{tb}/{sfn}_{name}.json"
            a = json.load(open(fa))
            b = json.load(open(fb))
            if a == b:
                print(f"IDENTICAL {name} ({len(a['rows'])} rows)")
                continue
            rc = 1
            if a["cols"] != b["cols"]:
                print(f"DIFFER {name}: cols {a['cols']} vs {b['cols']}")
                continue
            ra, rb = a["rows"], b["rows"]
            if len(ra) != len(rb):
                print(f"DIFFER {name}: rowcount {len(ra)} vs {len(rb)}")
            for i, (x, y) in enumerate(zip(ra, rb)):
                if x != y:
                    print(f"DIFFER {name}: first divergence at sorted row "
                          f"{i}:\n  a={x}\n  b={y}")
                    break
        return rc
    print("usage: ab_snapshot.py dump|cmp ...", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
