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


def _golden_pairs():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "tiktoken_golden_cl100k.json")
    with open(path) as f:
        return json.load(f)["pairs"]


def test_regex_proxy_deviation_vs_tiktoken_golden(spark):
    """Quantify the F8 regex proxy against vendored cl100k_base golden
    counts (tools/gen_tiktoken_golden.py regenerates them wherever
    tiktoken exists). The proxy is EXACT on plain word/punctuation text
    and deviates in three known ways: digit runs (tiktoken chunks 3
    digits/token, the proxy counts one run), whitespace-only strings
    (proxy 0), and contractions (proxy splits the apostrophe). The
    envelope asserts per-pair |proxy - golden| <= max(1, golden) and an
    aggregate mean ratio in [0.8, 1.1] — tight enough that a proxy
    regression (pattern edit) fails loudly."""
    from chronominer_spark.operators.textstats import token_count

    pairs = _golden_pairs()
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(pairs)], "i long, text string"
    )
    got = {r["i"]: r["n"] for r in
           df.select("i", token_count("text").alias("n")).collect()}
    ratios = []
    for i, (text, golden) in enumerate(pairs):
        proxy = got[i]
        assert abs(proxy - golden) <= max(1, golden), (text, proxy, golden)
        if golden:
            ratios.append(proxy / golden)
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.8 <= mean_ratio <= 1.1, mean_ratio


def test_tiktoken_udf_matches_golden_when_available(spark):
    """Exact-path parity: the Arrow tiktoken UDF must reproduce the
    golden counts bit-for-bit. Skipped in environments without tiktoken
    (this sandbox) — the golden file makes the claim executable the
    moment the package exists."""
    import pytest

    from chronominer_spark.operators.chunking import (
        tiktoken_available,
        tiktoken_count,
    )

    if not tiktoken_available():
        pytest.skip("tiktoken not installed")
    pairs = _golden_pairs()
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(pairs)], "i long, text string"
    )
    got = {r["i"]: r["n"] for r in
           df.select("i", tiktoken_count("text").alias("n")).collect()}
    for i, (text, golden) in enumerate(pairs):
        assert got[i] == golden, (text, got[i], golden)


def test_pack_sequences_greedy_boundaries(spark):
    """Doc-grain packing: pack closes when the next doc would overflow;
    an over-budget doc packs alone; offsets are the running token
    position within the pack; groups are independent."""
    from chronominer_spark.operators.chunking import pack_sequences

    rows = [("s1", 1, 80), ("s1", 2, 100), ("s1", 3, 30),  # 80+100 ok, +30 no
            ("s1", 4, 500),                                 # alone, over budget
            ("s1", 5, 10),
            ("s2", 1, 200)]                                 # exactly budget
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    got = {(r["source"], r["doc_id"]): (r["pack_id"], r["pack_offset"])
           for r in pack_sequences(df, "source", "doc_id", "n_tok",
                                   budget=200).collect()}
    assert got[("s1", 1)] == (1, 0)
    assert got[("s1", 2)] == (1, 80)
    assert got[("s1", 3)] == (2, 0)     # 80+100+30 > 200 -> new pack
    assert got[("s1", 4)] == (3, 0)     # 500 > 200 packs alone
    assert got[("s1", 5)] == (4, 0)     # after an over-budget pack
    assert got[("s2", 1)] == (1, 0)     # exact-budget doc fits pack 1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "source", "doc_id", "n_tok", budget=0)
