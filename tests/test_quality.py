"""Gopher-style repetition/quality gate (functions/analysis.py
repetition_quality) vs hand-computed expectations AND the DuckDB oracle
SQL from __spark_entry__ on a crafted multi-line fixture (the synthetic
documents table is single-line, so line-shape rules are exercised here)."""

import importlib.util
from pathlib import Path

import duckdb
import pandas as pd
import pytest

from tetrex_spark.functions.analysis import repetition_quality

REPO = Path(__file__).resolve().parent.parent

DOCS = [
    # multi-line with a duplicated line, bullets and an ellipsis line
    (1, "the cat sat\n- bullet one\n- bullet one\ntail..."),
    # dominant bigram + symbol soup
    (2, "foo bar foo bar foo bar baz ### ..."),
    (3, ""),
    (4, "single"),
    # a doc that passes every Gopher band: 60 distinct 4-char words
    (5, " ".join(f"w{i:03d}" for i in range(60))),
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = repetition_quality(df).orderBy("id").toPandas()
    return out.set_index("id")


def test_expected_values(result):
    r1 = result.loc[1]
    assert r1.n_words == 10
    assert r1.mean_word_len == pytest.approx(3.6)
    assert r1.dup_line_frac == pytest.approx(0.25)
    assert r1.top_bigram_frac == pytest.approx(0.222222)
    assert r1.symbol_word_ratio == pytest.approx(0.1)
    assert r1.frac_bullet_lines == pytest.approx(0.5)
    assert r1.frac_ellipsis_lines == pytest.approx(0.25)
    assert r1.keep == 0  # n_words < 50

    r2 = result.loc[2]
    assert r2.top_bigram_frac == pytest.approx(0.375)
    assert r2.symbol_word_ratio == pytest.approx(4 / 9, abs=1e-6)
    assert r2.keep == 0

    r3 = result.loc[3]
    assert r3.n_words == 0 and r3.keep == 0
    assert (
        r3[["mean_word_len", "dup_line_frac", "top_bigram_frac",
            "symbol_word_ratio", "frac_bullet_lines", "frac_ellipsis_lines"]]
        == 0.0
    ).all()

    r5 = result.loc[5]
    assert r5.n_words == 60
    assert r5.mean_word_len == pytest.approx(4.0)
    assert r5.top_bigram_frac == pytest.approx(round(1 / 59, 6))
    assert r5.keep == 1


def test_matches_duckdb_oracle(result):
    spec = importlib.util.spec_from_file_location(
        "entrymod", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )
    oracle = (
        con.execute(mod.oracle_sql()["quality_filter"])
        .df()
        .sort_values("id")
        .set_index("id")
    )
    assert list(oracle.columns) == list(result.columns)
    for col in result.columns:
        assert result[col].astype(float).tolist() == pytest.approx(
            oracle[col].astype(float).tolist()
        ), col


def test_url_normalize(spark):
    from tetrex_spark.functions.analysis import url_normalize_col

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/?q=1#frag", "http://example.com/Path/?q=1"),
        ("https://example.com:443/a/b/", "https://example.com/a/b"),
        ("https://sub.www.example.com/x", "https://sub.www.example.com/x"),
        ("http://example.com/?", "http://example.com"),
        ("http://example.com", "http://example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(url_normalize_col("url")).collect()]
    assert got == [w for _, w in cases]


def test_bpe_token_count_matches_python_re(spark):
    import re

    from tetrex_spark.functions.analysis import BPE_PRETOKEN_RE, bpe_token_count_col
    from tetrex_spark.functions.text import normalize_query

    docs = [(0, "It's a test-case, 123 numbers!"), (1, ""), (2, "don't stop... 42x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.n for r in df.select(
        "doc_id", bpe_token_count_col("text").alias("n")).collect()}
    for i, t in docs:
        assert got[i] == len(re.findall(BPE_PRETOKEN_RE, normalize_query(t))), t
