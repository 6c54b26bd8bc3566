"""Checkpointed per-partition lineage + metrics — resumable sketch builds
(explicit north-rule requirement; no analog in the reference, whose build
is a single-process all-or-nothing cereal dump, index_base.h:181-187).

Model: the corpus is sliced into `n_chunks` deterministic chunks
(pmod(xxhash64(url), n_chunks) — stable across runs and parallelism).
Each chunk's partial sketch rows are written to
`<dir>/chunks/chunk=<i>/` (parquet write is atomic via _SUCCESS), then a
lineage record (JSONL on the driver) commits the chunk with metrics.
Resume = skip committed chunks; finalize = merge all chunk partials with
the same associative merge the two-level tree uses, so a resumed build is
byte-identical (lattice sketches) to a single-shot one — property-tested.

At 100 TB: set n_chunks to the input's partition/file grain and store the
corpus partitioned by the chunk key — each chunk scan is then partition-
pruned instead of a filtered full pass; the lineage file lives on the
shared FS. Chunk commits are idempotent: a re-run of a committed chunk
overwrites the same path and re-commits the same content.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.sketch_build import SKETCH_ROW_SCHEMA, SketchSpec, _merger, build_sketches

LINEAGE_FILE = "lineage.jsonl"


class CheckpointedBuild:
    def __init__(
        self,
        checkpoint_dir: str,
        specs: list[SketchSpec],
        *,
        n_chunks: int = 16,
        build_id: str = "build-0",
    ):
        self.dir = checkpoint_dir
        self.specs = specs
        self.n_chunks = n_chunks
        self.build_id = build_id
        os.makedirs(f"{self.dir}/chunks", exist_ok=True)

    # -- lineage ----------------------------------------------------------

    def _lineage_path(self) -> str:
        return f"{self.dir}/{LINEAGE_FILE}"

    def lineage(self) -> list[dict]:
        if not os.path.exists(self._lineage_path()):
            return []
        with open(self._lineage_path()) as f:
            return [json.loads(line) for line in f if line.strip()]

    def committed_chunks(self) -> set[int]:
        return {
            r["chunk"]
            for r in self.lineage()
            if r["build_id"] == self.build_id and r["status"] == "committed"
        }

    def _commit(self, record: dict) -> None:
        with open(self._lineage_path(), "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")

    # -- build ------------------------------------------------------------

    def _chunk_filter(self, corpus: DataFrame, chunk: int):
        return corpus.filter(
            F.pmod(F.xxhash64(F.col("url")), F.lit(self.n_chunks)) == chunk
        )

    def run(self, corpus: DataFrame, *, resume: bool = True) -> DataFrame:
        """Build (or resume) all chunks, then return the merged sketch
        rows. Raises nothing on re-run of a finished build: all chunks
        are already committed and only the final merge executes."""
        if "bin_id" not in corpus.columns:
            raise ValueError("corpus needs bin_id (sources.corpus.with_bin_id)")
        done = self.committed_chunks() if resume else set()
        for chunk in range(self.n_chunks):
            if chunk in done:
                continue
            t0 = time.time()
            part = build_sketches(self._chunk_filter(corpus, chunk), self.specs)
            path = f"{self.dir}/chunks/chunk={chunk}"
            part.write.mode("overwrite").parquet(path)
            spark = corpus.sparkSession
            stats = (
                spark.read.parquet(path)
                .groupBy("name")
                .agg(
                    F.count(F.lit(1)).alias("bins"),
                    F.sum("n_items").alias("items"),
                    F.max("n_items").alias("max_bin_items"),
                )
                .collect()
            )
            self._commit(
                {
                    "build_id": self.build_id,
                    "chunk": chunk,
                    "status": "committed",
                    "duration_sec": round(time.time() - t0, 3),
                    "metrics": {
                        r["name"]: {
                            "bins": r["bins"],
                            "items": int(r["items"]),
                            "max_bin_items": int(r["max_bin_items"]),
                        }
                        for r in stats
                    },
                }
            )
        return self.finalize(corpus.sparkSession)

    def finalize(self, spark: SparkSession) -> DataFrame:
        """Merge every committed chunk's partials -> final sketch rows."""
        missing = set(range(self.n_chunks)) - self.committed_chunks()
        if missing:
            raise RuntimeError(f"cannot finalize: chunks {sorted(missing)} not committed")
        # read ONLY this build's chunk range — stale chunk=* dirs left by a
        # previous build with a larger n_chunks would otherwise be silently
        # merged in, double-counting documents
        all_parts = spark.read.parquet(
            *[f"{self.dir}/chunks/chunk={i}" for i in range(self.n_chunks)]
        )
        return all_parts.select("bin_id", "name", "payload", "n_items").groupBy(
            "bin_id", "name"
        ).applyInPandas(_merger, SKETCH_ROW_SCHEMA)

    def skew_report(self) -> dict:
        """Per-spec max/total item ratio across chunks — the 'document
        skew stats in lineage metrics' hook for salting decisions."""
        out: dict[str, dict] = {}
        for rec in self.lineage():
            if rec["build_id"] != self.build_id or rec["status"] != "committed":
                continue
            for name, m in rec["metrics"].items():
                agg = out.setdefault(
                    name, {"items": 0, "max_bin_items": 0, "max_to_mean_ratio": 0.0}
                )
                agg["items"] += m["items"]
                agg["max_bin_items"] = max(agg["max_bin_items"], m["max_bin_items"])
                # within-chunk skew: hottest bin vs mean bin
                ratio = m["max_bin_items"] * m["bins"] / max(m["items"], 1)
                agg["max_to_mean_ratio"] = max(agg["max_to_mean_ratio"], round(ratio, 3))
        return out


class CheckpointedDedup:
    """Resumable MinHash-LSH near-dup pipeline (the dedup counterpart of
    CheckpointedBuild — round-2 review asked for exactly this).

    Stage model, each committed to the JSONL lineage log:

      sigsets:<i>  the rep-level fused signature+set table, in
                   `n_chunks` deterministic chunks of the rep id space
                   (pmod(xxhash64(id), n_chunks) — stable across runs
                   and parallelism), each written atomically to
                   `<dir>/sigsets/chunk=<i>/`.
      pairs        verified rep-level near-dup pairs computed FROM THE
                   STORED sigset chunks (banding + cap + exact-Jaccard
                   verify), written to `<dir>/rep_pairs/`.

    A killed job resumes at the first uncommitted stage; the expanded
    member-level pair list (and any clustering on top — the CC rounds
    are a deterministic function of the stored pairs) is recomputed
    lazily from (docs, stored rep_pairs), so a resumed run is
    byte-identical to a single-shot one — tested by killing after the
    banding/sigset stage. `stop_after` ("sigsets:<i>" | "pairs")
    simulates the kill in tests."""

    def __init__(
        self,
        checkpoint_dir: str,
        *,
        k: int = 3,
        num_perm: int = 128,
        bands: int = 32,
        threshold: float = 0.8,
        max_bucket: int | None = 512,
        n_chunks: int = 8,
        build_id: str = "dedup-0",
    ):
        if num_perm % bands:
            raise ValueError("bands must divide num_perm")
        self.dir = checkpoint_dir
        self.k, self.num_perm, self.bands = k, num_perm, bands
        self.threshold, self.max_bucket = threshold, max_bucket
        self.n_chunks, self.build_id = n_chunks, build_id
        os.makedirs(f"{self.dir}/sigsets", exist_ok=True)
        # committed stages are only valid under the parameters that
        # produced them — resuming with a changed threshold/banding/chunk
        # grain against old artifacts would silently return stale or
        # incomplete pairs, so the parameter fingerprint is pinned per
        # build_id and mismatches refuse loudly
        params = {
            "k": k, "num_perm": num_perm, "bands": bands,
            "threshold": threshold, "max_bucket": max_bucket,
            "n_chunks": n_chunks,
        }
        ppath = f"{self.dir}/params_{build_id}.json"
        if os.path.exists(ppath):
            stored = json.loads(open(ppath).read())
            if stored != params:
                raise ValueError(
                    f"checkpoint {self.dir} (build_id={build_id}) was "
                    f"created with {stored}; resuming with {params} would "
                    "return stale results — use a new build_id or dir"
                )
        else:
            with open(ppath, "w") as f:
                f.write(json.dumps(params, sort_keys=True))

    def _lineage_path(self) -> str:
        return f"{self.dir}/{LINEAGE_FILE}"

    def lineage(self) -> list[dict]:
        if not os.path.exists(self._lineage_path()):
            return []
        with open(self._lineage_path()) as f:
            return [json.loads(line) for line in f if line.strip()]

    def committed(self) -> set[str]:
        return {
            r["stage"]
            for r in self.lineage()
            if r["build_id"] == self.build_id and r["status"] == "committed"
        }

    def _commit(self, stage: str, **metrics) -> None:
        with open(self._lineage_path(), "a") as f:
            f.write(
                json.dumps(
                    {"build_id": self.build_id, "stage": stage,
                     "status": "committed", **metrics},
                    sort_keys=True,
                )
                + "\n"
            )

    # -- stages -----------------------------------------------------------

    def run(
        self,
        df: DataFrame,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        resume: bool = True,
        stop_after: str | None = None,
        expand_exact_dups: bool = True,
    ) -> DataFrame | None:
        """Build (or resume) the pipeline; returns the member-level pair
        DataFrame (rep-level with expand_exact_dups=False), or None when
        `stop_after` simulated a kill."""
        from .operators.dedup import (
            dup_groups,
            expand_rep_pairs,
            minhash_sigs_and_sets,
            verify_rep_pairs,
        )

        spark = df.sparkSession
        docs, reps = dup_groups(df, text_col, id_col)
        done = self.committed() if resume else set()
        for chunk in range(self.n_chunks):
            stage = f"sigsets:{chunk}"
            if stage in done:
                continue
            t0 = time.time()
            part = minhash_sigs_and_sets(
                reps.filter(
                    F.pmod(F.xxhash64(F.col("id")), F.lit(self.n_chunks)) == chunk
                ),
                self.k, self.num_perm, "txt", "id",
            )
            path = f"{self.dir}/sigsets/chunk={chunk}"
            part.write.mode("overwrite").parquet(path)
            n = spark.read.parquet(path).count()
            self._commit(stage, rows=n, duration_sec=round(time.time() - t0, 3))
            if stop_after == stage:
                return None
        ss = spark.read.parquet(
            *[f"{self.dir}/sigsets/chunk={i}" for i in range(self.n_chunks)]
        )
        if "pairs" not in (self.committed() if resume else set()):
            t0 = time.time()
            handles: list = []
            rp = verify_rep_pairs(
                ss, bands=self.bands, r=self.num_perm // self.bands,
                threshold=self.threshold, max_bucket=self.max_bucket,
                release=handles,
            )
            rp.write.mode("overwrite").parquet(f"{self.dir}/rep_pairs")
            for fin in handles:
                fin()
            n = spark.read.parquet(f"{self.dir}/rep_pairs").count()
            self._commit("pairs", rows=n, duration_sec=round(time.time() - t0, 3))
            if stop_after == "pairs":
                return None
        rep_pairs = spark.read.parquet(f"{self.dir}/rep_pairs")
        if not expand_exact_dups:
            return rep_pairs
        # eligibility comes straight from the STORED sigset chunks (the
        # rows there are exactly the shingle-eligible reps) — no text
        # re-derivation on resume
        return expand_rep_pairs(docs, rep_pairs, ss.select("id"))
