"""Tests for fuzzy matching (J1), range repair (W4/W5), chunk slicing
(L1), t-digest quantiles, and 3-stage JSON extraction (F9)."""

import pytest
from pyspark.sql import functions as F

from chronominer_spark.constraints.tdigest import tdigest_quantiles
from chronominer_spark.functions.jsonx import extract_json, extract_json_string
from chronominer_spark.operators.fuzzy import fuzzy_match
from chronominer_spark.operators.ranges import (
    enforce_max_gap,
    sanitize_ranges,
    slice_chunks,
    trim_overlaps,
)


def test_fuzzy_match_greedy_one_to_one(spark):
    gt = spark.createDataFrame(
        [("c1", 1, "John Smith"), ("c1", 2, "Mary Jones"), ("c1", 3, "unmatchable zz")],
        "block string, gt_id long, name string",
    )
    hyp = spark.createDataFrame(
        [("c1", 10, "Jon Smith"), ("c1", 11, "mary  jones"), ("c1", 12, "totally different")],
        "block string, hyp_id long, name string",
    )
    m = fuzzy_match(gt, hyp, ["block"], "name", threshold=0.85)
    got = {(r["gt_id"], r["hyp_id"]) for r in m.collect()}
    assert (1, 10) in got            # Jon~John above threshold
    assert (2, 11) in got            # ws+case normalized exact
    assert all(g != 3 for g, _ in got)


def test_fuzzy_match_each_hyp_used_once(spark):
    gt = spark.createDataFrame(
        [("b", 1, "alpha beta"), ("b", 2, "alpha beta")],
        "block string, gt_id long, name string",
    )
    hyp = spark.createDataFrame(
        [("b", 9, "alpha beta")], "block string, hyp_id long, name string"
    )
    m = fuzzy_match(gt, hyp, ["block"], "name", threshold=0.85).collect()
    assert len(m) == 1
    assert m[0]["gt_id"] == 1  # deterministic tiebreak: lowest gt_id wins


def test_sanitize_ranges(spark):
    df = spark.createDataFrame(
        [(1, 1, 5), (1, 0, 3), (1, 7, 6)], "doc long, start long, end long"
    )
    ok, bad = sanitize_ranges(df)
    assert ok.count() == 1
    assert bad.count() == 2


def test_trim_overlaps(spark):
    df = spark.createDataFrame(
        [(1, 1, 10), (1, 8, 20), (1, 15, 30)], "doc long, start long, end long"
    )
    got = sorted((r["start"], r["end"]) for r in trim_overlaps(df, "doc").collect())
    assert got == [(1, 10), (11, 20), (21, 30)]


def test_trim_overlaps_swallowed_range(spark):
    # second range fully inside the first -> degenerates (start > end)
    df = spark.createDataFrame(
        [(1, 1, 100), (1, 10, 20), (1, 150, 160)], "doc long, start long, end long"
    )
    out = trim_overlaps(df, "doc")
    ok, bad = sanitize_ranges(out)
    assert sorted((r["start"], r["end"]) for r in ok.collect()) == [(1, 100), (150, 160)]
    assert bad.count() == 1


def test_enforce_max_gap(spark):
    df = spark.createDataFrame(
        [(1, 1, 10), (1, 20, 30)], "doc long, start long, end long"
    )
    got = sorted((r["start"], r["end"]) for r in
                 enforce_max_gap(df, "doc", max_gap=3).collect())
    assert got == [(1, 19), (20, 30)]


def test_slice_chunks_absolute_indices(spark):
    df = spark.createDataFrame(
        [("d", i) for i in range(1, 11)], "doc string, idx long"
    )
    assert slice_chunks(df, "doc", "idx", first_n=3).count() == 3
    last = slice_chunks(df, "doc", "idx", last_n=2)
    assert sorted(r["idx"] for r in last.collect()) == [9, 10]
    rng = slice_chunks(df, "doc", "idx", index_range=(4, 6))
    assert sorted(r["idx"] for r in rng.collect()) == [4, 5, 6]
    with pytest.raises(ValueError):
        slice_chunks(df, "doc", "idx", first_n=1, last_n=1)
    # over-request degrades to all rows
    assert slice_chunks(df, "doc", "idx", first_n=99).count() == 10


def test_tdigest_accuracy_vs_exact(spark, transcripts):
    got = tdigest_quantiles(
        transcripts, "pbucket", "length(text)", [0.5, 0.9, 0.99]
    )
    exact = transcripts.groupBy("pbucket").agg(
        F.percentile(F.expr("length(text)"), 0.5).alias("e50"),
        F.percentile(F.expr("length(text)"), 0.9).alias("e90"),
    )
    j = got.where(F.col("q") == 0.5).join(
        exact, got.part == exact.pbucket.cast("string")
    )
    rows = j.collect()
    assert rows
    for r in rows:
        assert abs(r["value"] - r["e50"]) <= max(10.0, 0.05 * r["e50"])


def test_tdigest_deterministic_across_partitionings(spark, transcripts):
    a = tdigest_quantiles(transcripts, "pbucket", "length(text)", [0.5])
    b = tdigest_quantiles(
        transcripts.repartition(64), "pbucket", "length(text)", [0.5]
    )
    va = {r["part"]: r["value"] for r in a.collect()}
    vb = {r["part"]: r["value"] for r in b.collect()}
    # merged digests differ only by centroid grouping; quantiles must
    # stay within the digest's own error bound across partitionings
    for k in va:
        assert abs(va[k] - vb[k]) <= max(5.0, 0.02 * va[k])


def test_json_extraction_three_stages(spark):
    rows = [
        (1, '{"k": 1}'),                                    # direct
        (2, 'text before ```json\n{"k": 2}\n``` after'),    # fenced
        (3, 'noise {"k": 3, "nested": {"x": 1}} trailing'), # balanced scan
        (4, 'no json here at all'),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, raw string")
    out = df.select(
        "id", extract_json("raw", "k int").alias("parsed"),
        extract_json_string("raw").alias("raw_json"),
    )
    got = {r["id"]: (r["parsed"]["k"] if r["parsed"] else None) for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: None, 5: None}


def test_resolve_anchor_lines_reference_semantics(spark):
    """W7: nearest-candidate resolution with bounded search + single
    expansion, mirroring readjuster._match_semantic_marker."""
    from chronominer_spark.operators.ranges import resolve_anchor_lines

    lines = spark.createDataFrame(
        [("d1", i, txt) for i, txt in enumerate(
            ["alpha beta", "the MARKER here", "gamma", "delta",
             "the marker here", "epsilon", "zeta", "marker again",
             "eta", "theta"], 1)],
        "doc string, line_no long, line string",
    )
    anchors = spark.createDataFrame(
        [
            # ambiguous: 'marker' at lines 2, 5, 8 in window -> nearest to 4 is 5
            ("d1", "a1", "marker", 1, 10, 4),
            # tie: lines 2 and 8 equidistant from 5 within window [1,10]
            # minus line 5? narrow window [1,3]+[7,10] impossible; use
            # nearest_to=5 with window [1,10]: line 5 itself wins (dist 0)
            ("d1", "a2", "marker", 1, 10, 5),
            # bounded: window [9,10] has no match; expansion by 1 reaches
            # line 8 -> resolves; without expansion it would be null
            ("d1", "a3", "marker", 9, 10, 9),
            # no match anywhere in window+expansion -> null
            ("d1", "a4", "zzzz", 1, 10, 5),
            # short marker rejected
            ("d1", "a5", "ab", 1, 10, 5),
            # case/whitespace-insensitive containment
            ("d1", "a6", "  The   MARKER ", 4, 6, 4),
        ],
        "doc string, anchor_id string, marker string, "
        "search_start long, search_end long, nearest_to long",
    )
    got = {r["anchor_id"]: r["resolved_line"]
           for r in resolve_anchor_lines(lines, anchors,
                                         context_window=1).collect()}
    assert got == {"a1": 5, "a2": 5, "a3": 8, "a4": None,
                   "a5": None, "a6": 5}

    # equidistant tie -> earlier line: marker at 2 and 8, nearest_to=5,
    # exclude line 5 by windowing [1,4] u [6,10]? single window: use a
    # doc without the middle occurrence
    lines2 = spark.createDataFrame(
        [("d2", 1, "x marker x"), ("d2", 2, "y"), ("d2", 3, "z marker z")],
        "doc string, line_no long, line string",
    )
    anchors2 = spark.createDataFrame(
        [("d2", "t1", "marker", 1, 3, 2)],
        "doc string, anchor_id string, marker string, "
        "search_start long, search_end long, nearest_to long",
    )
    got2 = resolve_anchor_lines(lines2, anchors2).collect()[0]["resolved_line"]
    assert got2 == 1  # ties break to the earlier line


def _reference_remove_overlaps(ranges):
    """Literal reimplementation of the reference loop
    (/root/reference/modules/line_ranges/readjuster.py:1642-1747) as the
    pytest oracle for remove_overlaps_exact."""
    annotated = sorted(
        [{"start": s, "end": e, "i": i} for i, (s, e) in enumerate(ranges)],
        key=lambda r: (r["start"], r["i"]),
    )
    processed = []
    for entry in annotated:
        cs, ce = entry["start"], entry["end"]
        if cs > ce:
            ce = cs
        if processed:
            prev = processed[-1]
            if prev["end"] >= cs:
                prev["end"] = min(prev["end"], max(prev["start"], cs - 1))
            if prev["end"] >= cs:
                cs = prev["end"] + 1
        if cs > ce:
            ce = cs
        processed.append({"start": cs, "end": ce, "i": entry["i"]})
    return [(p["start"], p["end"]) for p in processed]


def test_remove_overlaps_exact_matches_reference_loop(spark):
    from chronominer_spark.operators.ranges import remove_overlaps_exact

    # full containment, inversion, chained overlap, equal starts
    cases = {
        "contain": [(1, 40), (5, 8), (10, 12), (45, 50)],
        "invert": [(10, 3), (11, 15), (2, 6)],
        "chain": [(1, 5), (3, 7), (6, 10), (9, 12)],
        "eqstart": [(4, 9), (4, 6), (4, 5)],
        "clean": [(1, 3), (5, 8), (20, 25)],
    }
    rows = [
        (doc, i, s, e)
        for doc, rs in cases.items()
        for i, (s, e) in enumerate(rs)
    ]
    df = spark.createDataFrame(rows, "doc string, ord long, start long, end long")
    out = remove_overlaps_exact(df, "doc", order_col="ord")
    got = {
        doc: [(r["start"], r["end"]) for r in sorted(rws, key=lambda r: r["ord"])]
        for doc, rws in
        __import__("itertools").groupby(
            sorted(out.collect(), key=lambda r: (r["doc"], r["ord"])),
            key=lambda r: r["doc"],
        )
    }
    for doc, rs in cases.items():
        expected = _reference_remove_overlaps(rs)
        # reference output is in sorted order; re-key by original index
        ann = sorted(range(len(rs)), key=lambda i: (rs[i][0], i))
        by_ord = dict(zip(ann, expected))
        assert got[doc] == [by_ord[i] for i in range(len(rs))], doc


def test_remove_overlaps_exact_vs_one_pass_divergence(spark):
    """Pin exactly where the one-pass trim_overlaps plan diverges from
    the reference loop: identical on already-disjoint inputs (both
    no-ops); on ANY overlap the preserved boundary differs (one-pass
    keeps the predecessor's end and shifts the current start; the
    reference trims the predecessor's end to preserve the current
    start); on full containments the one-pass additionally drops the
    swallowed range to empty where the reference keeps a clamped
    range."""
    from chronominer_spark.operators.ranges import (
        remove_overlaps_exact,
        trim_overlaps,
    )

    disjoint = spark.createDataFrame(
        [("d", 0, 1, 5), ("d", 1, 7, 9), ("d", 2, 20, 22)],
        "doc string, ord long, start long, end long",
    )
    a = sorted(map(tuple, remove_overlaps_exact(disjoint, "doc", order_col="ord")
                   .select("ord", "start", "end").collect()))
    b = sorted(map(tuple, trim_overlaps(disjoint, "doc", order_col="ord")
                   .select("ord", "start", "end").collect()))
    assert a == b  # disjoint: both are no-ops

    overlap = spark.createDataFrame(
        [("d", 0, 1, 5), ("d", 1, 3, 9)],
        "doc string, ord long, start long, end long",
    )
    exact_o = {r["ord"]: (r["start"], r["end"]) for r in
               remove_overlaps_exact(overlap, "doc", order_col="ord").collect()}
    onepass_o = {r["ord"]: (r["start"], r["end"]) for r in
                 trim_overlaps(overlap, "doc", order_col="ord").collect()}
    assert exact_o == {0: (1, 2), 1: (3, 9)}    # prev end trimmed
    assert onepass_o == {0: (1, 5), 1: (6, 9)}  # cur start shifted

    degen = spark.createDataFrame(
        [("d", 0, 1, 40), ("d", 1, 5, 8)],
        "doc string, ord long, start long, end long",
    )
    exact = {r["ord"]: (r["start"], r["end"]) for r in
             remove_overlaps_exact(degen, "doc", order_col="ord").collect()}
    onepass = {r["ord"]: (r["start"], r["end"]) for r in
               trim_overlaps(degen, "doc", order_col="ord").collect()}
    # reference: prev trimmed to (1,4), contained range kept as (5,8)
    assert exact == {0: (1, 4), 1: (5, 8)}
    # one-pass: prev untouched, contained range shifted to empty (41>8)
    assert onepass[0] == (1, 40) and onepass[1][0] > onepass[1][1]


def _reference_enforce_max_gap(ranges, max_gap, deleted_spans=()):
    """Literal reimplementation of the reference loop
    (/root/reference/modules/line_ranges/readjuster.py:1749-1804)."""
    if not ranges:
        return []
    enforced = []
    for index, (start, end) in enumerate(ranges):
        if index == 0:
            enforced.append((start, end))
            continue
        prev_start, prev_end = enforced[-1]
        gap = start - prev_end - 1
        if gap > max_gap:
            new_prev_end = start - max_gap - 1
            for span_start, span_end in deleted_spans:
                if span_end > prev_end and span_start <= new_prev_end:
                    new_prev_end = min(new_prev_end, span_start - 1)
            if new_prev_end > prev_end:
                enforced[-1] = (prev_start, new_prev_end)
        enforced.append((start, end))
    return enforced


def test_enforce_max_gap_exact_matches_reference_loop(spark):
    from chronominer_spark.operators.ranges import enforce_max_gap_exact

    cases = {
        # plain oversized gap -> prev extended to start - max_gap - 1
        "plain": ([(1, 3), (30, 35), (40, 44)], []),
        # extension capped by a deleted span
        "span_cap": ([(1, 3), (30, 35)], [(10, 14)]),
        # span entirely behind prev end -> no cap
        "span_behind": ([(5, 9), (40, 42)], [(2, 4)]),
        # cap drives candidate below prev end -> no extension at all
        "span_blocks": ([(1, 8), (40, 42)], [(9, 20)]),
        # small gap untouched
        "small_gap": ([(1, 5), (8, 12)], []),
    }
    rows, span_rows = [], []
    for doc, (rs, spans) in cases.items():
        rows += [(doc, i, s, e) for i, (s, e) in enumerate(rs)]
        span_rows += [(doc, ss, se) for ss, se in spans]
    df = spark.createDataFrame(rows, "doc string, ord long, start long, end long")
    spans_df = spark.createDataFrame(
        span_rows or [("__none__", 0, 0)],
        "doc string, span_start long, span_end long",
    )
    out = enforce_max_gap_exact(df, "doc", max_gap=10, order_col="ord",
                                deleted_spans=spans_df)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc"], {})[r["ord"]] = (r["start"], r["end"])
    for doc, (rs, spans) in cases.items():
        expected = _reference_enforce_max_gap(rs, 10, spans)
        assert [got[doc][i] for i in range(len(rs))] == expected, doc


def test_enforce_max_gap_exact_keeps_duplicate_rows(spark):
    """Exact-duplicate input rows must survive the span-capped path —
    the collapse after the span join groups on a surrogate row id, not
    on value equality across every column (regression: groupBy(*cols)
    silently merged identical ranges when deleted_spans was given)."""
    from chronominer_spark.operators.ranges import enforce_max_gap_exact

    df = spark.createDataFrame(
        [("d", 0, 1, 3), ("d", 0, 1, 3), ("d", 1, 30, 35)],  # dup row
        "doc string, ord long, start long, end long",
    )
    spans = spark.createDataFrame(
        [("d", 10, 14)], "doc string, span_start long, span_end long")
    out = enforce_max_gap_exact(df, "doc", max_gap=10, order_col="ord",
                                deleted_spans=spans).collect()
    assert len(out) == 3  # both duplicates kept
    # and the span cap still applies: ends extended to span_start-1 = 9
    ends = sorted(r["end"] for r in out)
    assert ends[-1] == 35 and 9 in ends
