"""Optimization-round instrumentation (round 6): per-entry wall time,
Spark JOB COUNT (via status-tracker job groups — with AQE every
materialized exchange is its own job, so the count is the plan-shaped
fixed overhead that dominates toy-scale wall time), and
explain("formatted") capture for plans/r06/.

NOT the official bench (bench.py is frozen for measurement); numbers
from here are cited in OPTIMIZATION_r06.md as phase evidence only.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py [entry ...] [--plans SUFFIX] [--reps N]

With --plans, each named entry's executed plan is written to
plans/r06/<entry>_<SUFFIX>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_suffix = None
    reps = 2
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tetrex_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from tetrex_spark.sources.corpus import documents_as_corpus

    corpus = documents_as_corpus(spark, sf_dir)
    corpus.count()

    def _warm(it):
        import numpy  # noqa: F401
        import tetrex_spark.functions.text  # noqa: F401

        yield from it

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        _warm, "id long"
    ).count()

    qmap = entrymod.queries()
    names = args or [
        "hyperplane_pairs_t90", "jaccard_pairs_lsh", "dedup_clusters",
        "incremental_neardup", "bigram_pmi", "simhash_pairs",
        "strip_dup_spans", "substring_spans", "incremental_dedup",
        "distinct_shingles_by_lang", "heavy_hitters_cms", "token_budget",
        "importance_weights", "lm_quality", "embedding_near_dup",
        "decontaminate", "exact_dedup", "latest_snapshot",
    ]
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    import gc

    for name in names:
        fn = qmap[name]
        spark.catalog.clearCache()
        gc.collect()
        samples = []
        jobs = 0
        for rep in range(reps):
            grp = f"{name}-{rep}"
            sc.setJobGroup(grp, grp)
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            jobs = len(tracker.getJobIdsForGroup(grp) or [])
            samples.append(round(dt, 3))
            if plans_suffix and rep == reps - 1:
                os.makedirs("plans/r06", exist_ok=True)
                try:
                    ps = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception as ex:  # pragma: no cover
                    ps = f"<explain failed: {ex}>"
                with open(f"plans/r06/{name}_{plans_suffix}.txt", "w") as f:
                    f.write(ps)
        out[name] = {"min": min(samples), "samples": samples,
                     "jobs_last": jobs, "rows": n}
        print(name, json.dumps(out[name]), flush=True)
    print("TOTALS", json.dumps({k: v["min"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
