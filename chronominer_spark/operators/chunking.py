"""Token-budget chunking: the reference's unit-of-work operator (A9).

Reference parity: ``/root/reference/modules/infra/chunking.py:147-187``
(``TokenBasedChunking.get_line_ranges``) — walk a document's lines in
order accumulating per-line token counts; when adding the next line
would exceed ``tokens_per_chunk`` (and the current chunk is non-empty),
close the chunk and start a new one at that line. Emits absolute
1-based ``(start_line, end_line)`` ranges; an empty document emits no
chunks (the reference's phantom-chunk guard, ``chunking.py:183-186``);
a single line larger than the budget still becomes its own chunk.

Spark expression: the carry-dependent reset is not prefix-sum
decomposable, but greedy chunk boundaries ARE computable from the
cumulative token sum: starting at line *i* with consumed prefix
``base = S[i-1]``, the chunk ends at the largest *j* with
``S[j] <= base + budget`` (at least *i* itself). That is one
``np.searchsorted`` per *chunk* — O(#chunks · log n) per document
inside an Arrow-batched ``applyInPandas``, never per-line Python.
Documents are independent groups, so the operator scales with the
number of documents; the only shuffle is the groupBy(doc) hash.

Token counts are an input column, not computed here — the reference
separates the tokenizer (``TextProcessor``) from the chunking strategy
the same way. Use :func:`chronominer_spark.operators.textstats.token_count`
(+1 for the joined newline, see :func:`line_token_count`) for the
portable regex proxy, or :func:`tiktoken_count` where tiktoken is
installed (F8 parity; ``chunking.py:32-69,107-122``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronominer_spark.operators.textstats import token_count

__all__ = [
    "chunk_line_ranges",
    "line_token_count",
    "tiktoken_available",
    "tiktoken_count",
    "token_budget_chunks",
]


def line_token_count(text_col) -> F.Column:
    """Per-line token count under the portable regex proxy, counting the
    joined ``\\n`` as one token the way the reference counts it
    (``chunking.py:169-172``: chunks are joined with newlines downstream,
    so per-line counts without it undershoot)."""
    return (token_count(text_col) + F.lit(1)).cast("long")


def tiktoken_available() -> bool:
    try:
        import tiktoken  # noqa: F401
        return True
    except ImportError:
        return False


def tiktoken_count(text_col, encoding_name: str = "cl100k_base") -> F.Column:
    """Exact tiktoken token count as an Arrow-batched pandas UDF with the
    reference's fast path: ``encode_ordinary`` unless a literal
    special-token string occurs, then ``disallowed_special=()`` so
    verbatim '<|endoftext|>' tokenizes as plain text instead of raising
    (``chunking.py:107-122,160-167``). Raises ImportError at *plan build*
    when tiktoken is absent — callers fall back to the regex proxy."""
    import tiktoken  # hard fail here, not inside executors

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        import re

        enc = tiktoken.get_encoding(encoding_name)
        out = np.empty(len(s), dtype=np.int64)
        vals = s.fillna("").tolist()
        pat = re.compile("|".join(re.escape(t) for t in sorted(enc.special_tokens_set))) \
            if enc.special_tokens_set else None
        for i, text in enumerate(vals):
            if pat is None or pat.search(text) is None:
                out[i] = len(enc.encode_ordinary(text))
            else:
                out[i] = len(enc.encode(text, disallowed_special=()))
        return pd.Series(out)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _count(c)


def chunk_line_ranges(
    tokens: np.ndarray, budget: int
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy chunk boundaries over an ordered per-line token array.
    Returns (start_idx, end_idx) 0-based inclusive positions. Pure
    function so the pytest can diff it directly against a line-by-line
    reimplementation of the reference loop."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    cumsum = np.cumsum(tokens, dtype=np.int64)
    starts: list[int] = []
    ends: list[int] = []
    i = 0
    base = 0
    while i < n:
        j = int(np.searchsorted(cumsum, base + budget, side="right")) - 1
        if j < i:
            j = i  # single line over budget still forms its own chunk
        starts.append(i)
        ends.append(j)
        base = int(cumsum[j])
        i = j + 1
    return np.asarray(starts, dtype=np.int64), np.asarray(ends, dtype=np.int64)


def token_budget_chunks(
    df: DataFrame,
    doc_col: str,
    line_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Close a chunk when the running token sum would exceed ``budget``.

    Input: one row per line with (``doc_col``, ``line_col`` — absolute
    1-based, unique per doc — and ``tokens_col``). Output: one row per
    chunk with 1-based ``chunk_index``, absolute ``start_line`` /
    ``end_line``, ``n_lines``, ``chunk_tokens``.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    doc_field = df.schema[doc_col]
    schema = T.StructType([
        T.StructField(doc_col, doc_field.dataType, doc_field.nullable),
        T.StructField("chunk_index", T.LongType(), False),
        T.StructField("start_line", T.LongType(), False),
        T.StructField("end_line", T.LongType(), False),
        T.StructField("n_lines", T.LongType(), False),
        T.StructField("chunk_tokens", T.LongType(), False),
    ])

    def _chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(line_col, kind="mergesort")
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        lines = pdf[line_col].to_numpy(dtype=np.int64)
        starts, ends = chunk_line_ranges(toks, budget)
        if len(starts) == 0:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        cumsum = np.cumsum(toks, dtype=np.int64)
        prev = np.where(starts > 0, cumsum[starts - 1], 0)
        return pd.DataFrame({
            doc_col: np.repeat(pdf[doc_col].iloc[0], len(starts)),
            "chunk_index": np.arange(1, len(starts) + 1, dtype=np.int64),
            "start_line": lines[starts],
            "end_line": lines[ends],
            "n_lines": ends - starts + 1,
            "chunk_tokens": cumsum[ends] - prev,
        })

    return (
        df.select(doc_col, line_col, tokens_col)
        .groupBy(doc_col)
        .applyInPandas(_chunk, schema)
    )


def pack_sequences(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Sequence packing — the pretraining batch-construction op: within
    each ``group_col`` (source / shard), documents ordered by ``id_col``
    are greedily packed into fixed-token-budget training sequences (a
    pack closes when adding the next doc would exceed ``budget``; a
    single over-budget doc still forms its own pack, mirroring
    :func:`chunk_line_ranges`, whose boundary function this reuses at
    the doc grain instead of the line grain).

    Output: one row per doc with 1-based ``pack_id`` and the doc's
    0-based ``pack_offset`` in tokens within its pack — what a sequence
    writer needs to place each doc.

    Scale posture: shuffle = groupBy(group) only; per-group work is the
    O(#packs·log n) searchsorted walk in one Arrow batch, state bounded
    by the group's doc count (groups are shards — bounded by
    construction)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    g_field, i_field = df.schema[group_col], df.schema[id_col]
    schema = T.StructType([
        T.StructField(group_col, g_field.dataType, g_field.nullable),
        T.StructField(id_col, i_field.dataType, i_field.nullable),
        T.StructField(tokens_col, T.LongType(), False),
        T.StructField("pack_id", T.LongType(), False),
        T.StructField("pack_offset", T.LongType(), False),
    ])

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        starts, ends = chunk_line_ranges(toks, budget)
        n = len(toks)
        if n == 0:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        sizes = ends - starts + 1
        pack_ids = np.repeat(
            np.arange(1, len(starts) + 1, dtype=np.int64), sizes)
        cumsum = np.cumsum(toks, dtype=np.int64)
        pack_base = np.repeat(
            np.where(starts > 0, cumsum[starts - 1], 0), sizes)
        offsets = cumsum - toks - pack_base
        return pd.DataFrame({
            group_col: pdf[group_col].to_numpy(),
            id_col: pdf[id_col].to_numpy(),
            tokens_col: toks,
            "pack_id": pack_ids,
            "pack_offset": offsets,
        })

    return (
        df.select(group_col, id_col, tokens_col)
        .groupBy(group_col)
        .applyInPandas(_pack, schema)
    )
