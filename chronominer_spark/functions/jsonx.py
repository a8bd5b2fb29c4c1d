"""JSON extraction from noisy text — the 3-stage parser (F9/F10).

Re-expresses ``/root/reference/modules/conversion/json_utils.py:188-246``:

1. direct parse (``from_json`` with schema — null on failure),
2. code-fence extraction (`````json ... ````` via ``regexp_extract``)
   then parse,
3. balanced-brace scan — the only stage needing real state, implemented
   as an Arrow-vectorized pandas UDF (never row-at-a-time in the JVM
   loop).

``extract_json`` composes the stages with ``coalesce`` so the JVM fast
paths win whenever they can and the Python stage sees only the rows the
first two stages failed on.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_FENCE_RE = r"```(?:json)?\s*(\{[\s\S]*?\})\s*```"


@F.pandas_udf(StringType())
def balanced_json_udf(s: pd.Series) -> pd.Series:
    """Stage 3: first balanced {...} span that parses as JSON."""
    def scan(v):
        if v is None:
            return None
        start = v.find("{")
        while start != -1:
            depth = 0
            in_str = False
            esc = False
            for i in range(start, len(v)):
                ch = v[i]
                if esc:
                    esc = False
                    continue
                if ch == "\\":
                    esc = in_str
                elif ch == '"':
                    in_str = not in_str
                elif not in_str:
                    if ch == "{":
                        depth += 1
                    elif ch == "}":
                        depth -= 1
                        if depth == 0:
                            cand = v[start:i + 1]
                            try:
                                json.loads(cand)
                                return cand
                            except ValueError:
                                break
            start = v.find("{", start + 1)
        return None

    return s.map(scan)


def extract_json_string(col: Column | str) -> Column:
    """The raw JSON text recovered by the first stage that succeeds."""
    c = F.col(col) if isinstance(col, str) else col
    direct = F.when(
        F.try_parse_json(c).isNotNull(), c
    )
    fenced_raw = F.regexp_extract(c, _FENCE_RE, 1)
    fenced = F.when(
        (fenced_raw != "") & F.try_parse_json(fenced_raw).isNotNull(), fenced_raw
    )
    return F.coalesce(direct, fenced, balanced_json_udf(c))


def extract_json(col: Column | str, schema) -> Column:
    """Schema-directed parse of the recovered JSON (F10): null result =
    violation (route to the engine's cast/parse constraint)."""
    return F.from_json(extract_json_string(col), schema)
