"""pii_scrub vs hand-computed expectations AND the DuckDB oracle on a
crafted fixture (the synthetic documents carry no PII, so the sf-level
driver check only proves the zero case; redaction semantics live here)."""

import importlib.util
from pathlib import Path

import duckdb
import pandas as pd

from tetrex_spark.functions.analysis import pii_scrub

REPO = Path(__file__).resolve().parent.parent

DOCS = [
    (1, "contact Bob.Smith+x@Example.org or admin@sub.domain.co today"),
    (2, "server at 10.0.255.3 port 80; backup 192.168.1.1."),
    (3, "call +44 20 7946 0958 or 555-1234 x"),  # 555-1234: 8 chars < 9 min
    (4, "no pii here, just text with 1.2 numbers and a@b (too short)"),
    (5, ""),
]


def test_expected_redactions(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r.id: r for r in pii_scrub(df).collect()}
    assert out[1].n_email == 2 and out[1].n_ipv4 == 0
    assert out[1].clean_text == "contact <EMAIL> or <EMAIL> today"
    assert out[2].n_ipv4 == 2 and out[2].n_email == 0
    assert out[2].clean_text == "server at <IP> port 80; backup <IP>."
    assert out[3].n_phone == 1  # '+44 20 7946 0958'; 555-1234 too short
    assert out[3].clean_text == "call <PHONE> or 555-1234 x"
    assert out[4].n_email == 0 and out[4].n_ipv4 == 0 and out[4].n_phone == 0
    assert out[4].clean_text == DOCS[3][1]
    assert out[5].clean_text == ""


def test_matches_duckdb_oracle(spark):
    spec = importlib.util.spec_from_file_location(
        "entrymod", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    oracle = (
        con.execute(mod.oracle_sql()["pii_scrub"])
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = pii_scrub(df).toPandas().sort_values("id").reset_index(drop=True)
    for col in got.columns:
        assert got[col].tolist() == oracle[col].tolist(), col
