"""Checkpoint/resume: interrupted builds resume from lineage and produce
byte-identical lattice payloads to a single-shot build."""

import numpy as np
import pytest

from tetrex_spark.lineage import CheckpointedBuild
from tetrex_spark.operators.sketch_build import SketchSpec, build_sketches
from tetrex_spark.sources.corpus import webtext_small, with_bin_id


def specs():
    return [
        SketchSpec("bloom", "bloom", "token_shingle", k=2,
                   params={"m_bits": 1 << 14, "n_hashes": 3}),
        SketchSpec("hll", "hll", "token_shingle", k=2, params={"p": 11}),
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    return with_bin_id(webtext_small(spark), 8).cache()


def _payloads(rows):
    return {(r["bin_id"], r["name"]): bytes(r["payload"]) for r in rows}


def test_checkpointed_equals_single_shot(spark, corpus, tmp_path):
    single = _payloads(build_sketches(corpus, specs()).collect())
    cb = CheckpointedBuild(str(tmp_path / "ck"), specs(), n_chunks=4)
    chunked = _payloads(cb.run(corpus).collect())
    assert chunked == single


def test_resume_skips_committed_chunks(spark, corpus, tmp_path):
    ck = str(tmp_path / "ck2")
    cb = CheckpointedBuild(ck, specs(), n_chunks=4)
    # simulate a partial run: build only chunks 0 and 1, then "crash"
    for chunk in [0, 1]:
        part = build_sketches(cb._chunk_filter(corpus, chunk), specs())
        part.write.mode("overwrite").parquet(f"{ck}/chunks/chunk={chunk}")
        cb._commit({"build_id": cb.build_id, "chunk": chunk,
                    "status": "committed", "duration_sec": 0.0, "metrics": {}})
    assert cb.committed_chunks() == {0, 1}
    # resume completes the rest; result identical to single shot
    out = _payloads(cb.run(corpus).collect())
    single = _payloads(build_sketches(corpus, specs()).collect())
    assert out == single
    assert cb.committed_chunks() == {0, 1, 2, 3}


def test_finalize_refuses_incomplete(spark, corpus, tmp_path):
    cb = CheckpointedBuild(str(tmp_path / "ck3"), specs(), n_chunks=4)
    with pytest.raises(RuntimeError, match="not committed"):
        cb.finalize(spark)


def test_finalize_ignores_stale_chunk_dirs(spark, corpus, tmp_path):
    """A chunk=<i> dir left by a previous build with a larger n_chunks must
    NOT be merged in (it would double-count documents)."""
    ck = str(tmp_path / "ck5")
    # previous build with 8 chunks leaves dirs chunk=0..7
    old = CheckpointedBuild(ck, specs(), n_chunks=8, build_id="old")
    old.run(corpus)
    # new 4-chunk build in the same dir: chunks 4..7 are stale for it
    cb = CheckpointedBuild(ck, specs(), n_chunks=4, build_id="new")
    out = _payloads(cb.run(corpus).collect())
    single = _payloads(build_sketches(corpus, specs()).collect())
    assert out == single


def test_skew_report(spark, corpus, tmp_path):
    cb = CheckpointedBuild(str(tmp_path / "ck4"), specs(), n_chunks=2)
    cb.run(corpus)
    rep = cb.skew_report()
    assert "bloom" in rep and rep["bloom"]["items"] > 0
    # webtext_small is host-skewed by construction: h0 owns half the docs
    assert rep["bloom"]["max_to_mean_ratio"] > 1.0
