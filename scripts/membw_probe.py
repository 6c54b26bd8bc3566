"""Measured decomposition of the N -> 4N scaling residual (north rule).

Three Spark-free workloads at 1, 4 and 16 worker processes on this host:

  cpu     — pure-ALU splitmix64 iterations over a 4 KB (L1-resident)
            array: no DRAM traffic; measures the host's raw core-count
            scaling ceiling.
  membw   — streaming triad (c = a*s + b) over 256 MB/process: pure DRAM
            bandwidth; measures how the shared single-socket memory bus
            divides across processes.
  kernel  — the actual sketch partial-build kernel (tokenize + shingle
            hash + 5-sketch update) over synthetic documents/process:
            where the real build spends its executor CPU.

If kernel's 4->16 efficiency tracks membw's (and both sit well below
cpu's), the sketch build is DRAM-bandwidth-bound at high core counts on
this ONE socket — i.e. the scaling loss is socket share, not algorithm:
4N real executors bring 4N memory buses. Prints one JSON line per
(workload, procs) plus a summary.

Usage: python scripts/membw_probe.py
       python scripts/membw_probe.py --worker <kind> <seconds-budget>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PROCS = (1, 4, 16)
MIN_OF = 2


def _work_cpu() -> tuple[int, float]:
    """splitmix64 rounds on an L1-resident array; returns (ops, sec)."""
    import numpy as np

    from tetrex_spark.kernel.hashing import splitmix64

    z = np.arange(512, dtype=np.uint64)  # 4 KB
    iters = 20_000
    t0 = time.time()
    for _ in range(iters):
        z = splitmix64(z)
    return 512 * iters, time.time() - t0


def _work_membw() -> tuple[int, float]:
    """Streaming triad over 256 MB; returns (bytes_moved, sec)."""
    import numpy as np

    n = 32 * 1024 * 1024  # 3 x 256 MB float64 arrays
    a = np.ones(n)
    b = np.ones(n)
    c = np.empty(n)
    reps = 4
    t0 = time.time()
    for _ in range(reps):
        np.multiply(a, 1.000001, out=c)
        c += b
    # traffic per rep: read a + read b + write c (+RFO) ~ 4 arrays
    return reps * 4 * n * 8, time.time() - t0


def _work_kernel() -> tuple[int, float]:
    """The real partial-build kernel on synthetic docs; returns (docs, sec)."""
    import numpy as np
    import pandas as pd

    from tetrex_spark.operators.sketch_build import SketchSpec, _partial_builder

    rng = np.random.default_rng(os.getpid())
    words = [f"w{i}" for i in range(4096)]
    docs = [
        " ".join(words[j] for j in rng.integers(0, len(words), 60))
        for _ in range(40_000)
    ]
    pdf = pd.DataFrame(
        {"bin_id": rng.integers(0, 64, len(docs)), "text": docs}
    )
    specs = [
        SketchSpec("bloom", "bloom", "token_shingle", k=3,
                   params={"m_bits": 1 << 20, "n_hashes": 3}),
        SketchSpec("hll", "hll", "token_shingle", k=3, params={"p": 12}),
        SketchSpec("cms", "cms", "token", k=1, params={"width": 2048, "depth": 5}),
        SketchSpec("kll", "kll", "doc_length_tokens", params={"k": 200}),
        SketchSpec("td", "tdigest", "doc_length_chars", params={"delta": 100.0}),
    ]
    fn = _partial_builder(specs, has_html=False)
    t0 = time.time()
    for _ in fn(iter([pdf])):
        pass
    return len(docs), time.time() - t0


WORKS = {"cpu": _work_cpu, "membw": _work_membw, "kernel": _work_kernel}


def run_leg(kind: str, procs: int, min_of: int = MIN_OF) -> float:
    """One (workload, procs) leg -> best aggregate throughput."""
    env = dict(os.environ, PYTHONPATH=str(REPO))
    best = 0.0
    for _ in range(min_of):
        ps = [
            subprocess.Popen(
                [sys.executable, __file__, "--worker", kind, "0"],
                stdout=subprocess.PIPE, text=True, env=env,
            )
            for _ in range(procs)
        ]
        total_units, secs = 0, []
        for p in ps:
            out, _ = p.communicate(timeout=900)
            rec = json.loads(out.splitlines()[-1])
            total_units += rec["units"]
            secs.append(rec["sec"])
        best = max(best, total_units / max(secs))
    return best


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        units, sec = WORKS[sys.argv[2]]()
        print(json.dumps({"units": units, "sec": sec}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        print(json.dumps({"workload": sys.argv[2], "procs": int(sys.argv[3]),
                          "agg_throughput": round(run_leg(sys.argv[2], int(sys.argv[3])), 1)}))
        return
    env = dict(os.environ, PYTHONPATH=str(REPO))
    results: dict[str, dict[int, float]] = {}
    for kind in WORKS:
        results[kind] = {}
        for procs in PROCS:
            best = 0.0
            for _ in range(MIN_OF):
                ps = [
                    subprocess.Popen(
                        [sys.executable, __file__, "--worker", kind, "0"],
                        stdout=subprocess.PIPE, text=True, env=env,
                    )
                    for _ in range(procs)
                ]
                total_units, secs = 0, []
                for p in ps:
                    out, _ = p.communicate(timeout=900)
                    rec = json.loads(out.splitlines()[-1])
                    total_units += rec["units"]
                    secs.append(rec["sec"])
                # aggregate throughput over the straggler's timed section
                # (untimed per-process setup — interpreter, imports, data
                # generation — is excluded, as in the Spark legs)
                best = max(best, total_units / max(secs))
            results[kind][procs] = best
            print(json.dumps({"workload": kind, "procs": procs,
                              "agg_throughput": round(best, 1)}))
    summary = {}
    for kind, r in results.items():
        summary[kind] = {
            "eff_1_to_4": round(r[4] / (4 * r[1]), 3),
            "eff_4_to_16": round(r[16] / (4 * r[4]), 3),
        }
    print(json.dumps({"metric": "scaling_decomposition", "summary": summary}))


if __name__ == "__main__":
    main()
