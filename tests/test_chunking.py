"""Token-budget chunking (A9) vs a line-by-line reimplementation of the
reference loop (``/root/reference/modules/infra/chunking.py:147-187``)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from chronominer_spark.operators.chunking import (
    chunk_line_ranges,
    line_token_count,
    token_budget_chunks,
)


def reference_loop(tokens: list[int], budget: int) -> list[tuple[int, int]]:
    """Straight-Python port of TokenBasedChunking.get_line_ranges
    semantics (1-based inclusive ranges), used ONLY as the test oracle."""
    ranges: list[tuple[int, int]] = []
    current = 0
    start = 1
    end = 1
    for idx, line_tokens in enumerate(tokens, 1):
        if current + line_tokens > budget and current > 0:
            ranges.append((start, end))
            start = idx
            current = line_tokens
        else:
            current += line_tokens
        end = idx
    if tokens and start <= end:
        ranges.append((start, end))
    return ranges


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("budget", [1, 7, 50, 10_000])
def test_chunk_line_ranges_matches_reference_loop(seed, budget):
    rng = random.Random(seed)
    n = rng.randrange(0, 400)
    # include oversized lines (> budget) and minimal lines
    tokens = [rng.choice([1, 2, 3, 5, budget, budget + 13]) for _ in range(n)]
    starts, ends = chunk_line_ranges(np.array(tokens, dtype=np.int64), budget)
    got = [(int(s) + 1, int(e) + 1) for s, e in zip(starts, ends)]
    assert got == reference_loop(tokens, budget)


def test_chunk_line_ranges_empty_input_emits_no_phantom_chunk():
    starts, ends = chunk_line_ranges(np.empty(0, dtype=np.int64), 100)
    assert len(starts) == 0 and len(ends) == 0
    assert reference_loop([], 100) == []


def test_chunk_line_ranges_every_line_covered_once():
    rng = random.Random(99)
    tokens = np.array([rng.randrange(1, 40) for _ in range(1000)], dtype=np.int64)
    starts, ends = chunk_line_ranges(tokens, 100)
    # contiguous, non-overlapping, full coverage
    assert starts[0] == 0 and ends[-1] == len(tokens) - 1
    assert (starts[1:] == ends[:-1] + 1).all()
    # every chunk but possibly single-line-oversized ones is within budget
    cs = np.cumsum(tokens)
    sums = cs[ends] - np.where(starts > 0, cs[starts - 1], 0)
    over = sums > 100
    assert (ends[over] == starts[over]).all()


def test_token_budget_chunks_spark_matches_python(spark):
    rng = random.Random(7)
    rows = []
    for doc in range(12):
        n_lines = rng.randrange(0, 120)
        for ln in range(1, n_lines + 1):
            rows.append((f"doc{doc}", ln, rng.randrange(1, 30)))
    df = spark.createDataFrame(rows, "doc string, ln long, tok long") \
        .repartition(8)
    out = token_budget_chunks(df, "doc", "ln", "tok", budget=64)
    got = {
        (r["doc"], r["chunk_index"]): (r["start_line"], r["end_line"],
                                       r["n_lines"], r["chunk_tokens"])
        for r in out.collect()
    }
    # python oracle per doc
    by_doc: dict[str, list[int]] = {}
    for doc, ln, tok in rows:
        by_doc.setdefault(doc, []).append(tok)  # rows are in ln order
    want = {}
    for doc, toks in by_doc.items():
        for ci, (s, e) in enumerate(reference_loop(toks, 64), 1):
            want[(doc, ci)] = (s, e, e - s + 1, sum(toks[s - 1:e]))
    assert got == want


def test_token_budget_chunks_absolute_indices_survive_slicing(spark):
    # lines 101..200 of a larger doc: ranges must stay in absolute space
    rows = [("d", ln, 10) for ln in range(101, 201)]
    df = spark.createDataFrame(rows, "doc string, ln long, tok long")
    out = token_budget_chunks(df, "doc", "ln", "tok", budget=25).collect()
    assert min(r["start_line"] for r in out) == 101
    assert max(r["end_line"] for r in out) == 200
    # budget 25 / 10-token lines -> 2 lines per chunk
    assert all(r["n_lines"] == 2 for r in out)


def test_line_token_count_counts_newline(spark):
    df = spark.createDataFrame([("hello world",), ("",), (None,)], "text string")
    got = [r[0] for r in df.select(line_token_count("text")).collect()]
    # 2 word tokens + newline; empty/null lines still cost the newline
    assert got == [3, 1, 1]


def test_token_budget_chunks_parallelism_invariant(spark):
    rows = [(f"doc{d}", ln, (ln * 7 + d) % 23 + 1)
            for d in range(6) for ln in range(1, 300)]
    df = spark.createDataFrame(rows, "doc string, ln long, tok long")
    a = token_budget_chunks(df.repartition(1), "doc", "ln", "tok", 75)
    b = token_budget_chunks(df.repartition(32), "doc", "ln", "tok", 75)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
