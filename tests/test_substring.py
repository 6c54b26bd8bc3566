"""substring_dup_spans: exact duplicated-span discovery.

Oracle in these tests = O(n·m) dynamic-programming longest-common-
substring over the normalized texts (the same contract the DuckDB
driver oracle re-states as an L-gram diagonal-run query): for every
pair with LCS >= min_len, the operator must report exactly (max length,
smallest (pos_a, pos_b) span start among maxima, 1-based)."""

import re

import numpy as np
import pytest


def _norm(s: str | None) -> str:
    return re.sub(r"\s+", " ", s).strip().lower() if s else ""


def _lcs(a: str, b: str):
    """(len, pos_a, pos_b) of the longest common substring, ties to the
    smallest (pos_a, pos_b); positions 1-based. Plain DP oracle."""
    a, b = _norm(a), _norm(b)
    best = (0, 0, 0)
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    bb = np.frombuffer(b.encode(), dtype=np.uint8)
    for i in range(1, len(a) + 1):
        cur = np.zeros(len(b) + 1, dtype=np.int64)
        eq = bb == a[i - 1].encode()[0]
        cur[1:][eq] = prev[:-1][eq] + 1
        j = int(cur.argmax())
        if cur[j]:
            cand = (int(cur[j]), i - int(cur[j]) + 1, j - int(cur[j]) + 1)
            # max length; among maxima the smallest (pos_a, pos_b).
            # Scanning i ascending + argmax's first-j preference yields
            # the smallest pos for each fresh maximum already; only
            # replace on a strictly longer match.
            if cand[0] > best[0]:
                best = cand
        prev = cur
    return best


def _expected_pairs(rows, min_len):
    out = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            l, pa, pb = _lcs(rows[i][1], rows[j][1])
            if l >= min_len:
                out[(rows[i][0], rows[j][0])] = (l, pa, pb)
    return out


def _got_pairs(spark, rows, min_len, k=16, **kw):
    from tetrex_spark.operators.substring import substring_dup_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["id_a"], r["id_b"]): (r["match_len"], r["pos_a"], r["pos_b"])
        for r in substring_dup_spans(df, min_len, k, **kw).collect()
    }


BOILER = ("all rights reserved this page uses cookies to improve your "
          "experience please accept our terms of service")


def test_planted_spans_match_dp_oracle(spark):
    rows = [
        (1, f"alpha document one {BOILER} and then unique tail one"),
        (2, f"beta document two with {BOILER} plus other unique text"),
        (3, "gamma shares nothing with the others in this small corpus"),
        (4, f"delta has the span twice {BOILER} middle {BOILER} end"),
        (5, "epsilon    has   WHITESPACE  and CASE variants: " + BOILER.upper()),
        (6, "short"),
        (7, None),
        (8, ""),
    ]
    want = _expected_pairs(rows, 40)
    got = _got_pairs(spark, rows, 40)
    assert got == want
    assert (1, 2) in got and (1, 5) in got  # normalization matters


def test_winnowing_guarantee_random_planted(spark):
    """Recall-1 property: a span of EXACTLY min_len planted at random
    offsets in otherwise-random text is always found (the winnowing
    window is sized so every qualifying span holds an anchor)."""
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    span = "".join(rng.choice(letters, 40)).replace(" ", "x")
    rows = []
    for i in range(12):
        pad_l = "".join(rng.choice(letters[:-1], int(rng.integers(0, 120))))
        pad_r = "".join(rng.choice(letters[:-1], int(rng.integers(0, 120))))
        rows.append((i, pad_l + span + pad_r))
    got = _got_pairs(spark, rows, 40)
    for i in range(12):
        for j in range(i + 1, 12):
            assert (i, j) in got, (i, j)
            assert got[(i, j)][0] >= 40


def test_below_min_len_not_reported(spark):
    shared39 = "the shared run here is exactly thirtynine"[:39]
    assert len(shared39) == 39
    # no whitespace abutting the span: boundary chars differ so the
    # shared run is exactly 39 normalized chars
    rows = [
        (1, f"aa q{shared39}q tail one padding padding padding padding"),
        (2, f"bb z{shared39}z tail two padding padding padding padding"),
    ]
    # the DP oracle confirms the premise (shared < 40)
    assert _lcs(rows[0][1], rows[1][1])[0] < 40
    assert _got_pairs(spark, rows, 40) == {}


def test_bucket_cap_drops_are_bounded_not_fatal(spark, caplog):
    """A span verbatim in more docs than max_bucket: whole-bucket drops
    (warn-logged by the shared cap machinery), never an error; with the
    cap lifted the full quadratic pair set appears."""
    rows = [(i, f"doc {i} prefix {BOILER} suffix number {i}")
            for i in range(10)]
    full = _got_pairs(spark, rows, 40, max_bucket=None)
    assert len(full) == 45  # C(10,2)
    capped = _got_pairs(spark, rows, 40, max_bucket=4)
    assert len(capped) < 45


def test_deterministic_across_partitionings(spark):
    rows = [(i, f"doc {i} body {BOILER} tail {i % 3}") for i in range(9)]
    rows += [(100 + i, f"unique {i} " + "filler words here " * 8)
             for i in range(6)]
    from tetrex_spark.operators.substring import substring_dup_spans

    outs = []
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "doc_id long, text string") \
            .repartition(parts)
        outs.append(sorted(
            tuple(r) for r in
            substring_dup_spans(df, 40, 16).collect()
        ))
    assert outs[0] == outs[1]
    assert outs[0] == sorted(
        (a, b, *v) for (a, b), v in _expected_pairs(rows, 40).items()
    )


def test_min_len_validation(spark):
    from tetrex_spark.operators.substring import substring_dup_spans

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_len"):
        substring_dup_spans(df, min_len=8, k=16)


def test_anchor_rows_density_and_coords(spark):
    """Anchors are winnowing-sparse (far fewer than one per char) and
    their (pos, hash) coordinates are consistent: re-hashing the k-gram
    at each reported position reproduces the anchor hash."""
    from tetrex_spark.functions.text import normalize_series
    from tetrex_spark.kernel.hashing import hash_char_kgrams_series
    from tetrex_spark.operators.substring import winnow_anchor_rows

    import pandas as pd

    text = ("spark shuffles partition data across executors while the "
            "optimizer prunes columns and pushes filters down " * 4)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    anchors = winnow_anchor_rows(df, 16, 25).collect()
    n = len(normalize_series(pd.Series([text])).iat[0])
    assert 0 < len(anchors) < n / 4  # density ~2/(w+1) ~ 0.077
    norm = normalize_series(pd.Series([text])).iat[0]
    for r in anchors:
        gram = norm[r["pos"]:r["pos"] + 16]
        h, _ = hash_char_kgrams_series(pd.Series([gram]), 16)
        assert h.view(np.int64)[0] == r["bh"]
