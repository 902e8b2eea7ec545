"""North-rule scaling evidence: run the flagship ER pipeline at two
parallelism levels (local[N] vs local[4N] — the sandbox stand-in for N
vs 4N executors) on the SAME synthetic input, report docs/sec at both
plus scaling efficiency = (T_N / T_4N) / 4, and write the numbers into
BASELINE.md's "Measured scaling" section.

Default N=2 vs 4N=8: this Firecracker VM cannot deliver 4x real
compute from 8->32 threads even for pure whole-stage-codegen work with
zero shuffle (measured ceiling: 2.68x speedup = 0.67 efficiency on a
4B-row xxhash aggregation), so 8->32 results say nothing about the
JOB's scalability. 2->8 the hardware ceiling spans 0.73-0.89 by
session, which a well-partitioned job can approach. The ceiling
microbenchmark runs alongside and is reported for context; every run
(with its same-session ceiling) is appended to tools/scaling_runs.jsonl
and the BASELINE.md table is regenerated from the full log.

Usage: python tools/scaling.py [n_pages] [--low 2] [--high 8]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, n_pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--cores", str(cores), "--only", "pipeline_entity_clusters",
         "--pages", str(n_pages), "--sf-dir", "/root/testdata/sf0.1"],
        # guard only — 32M pages x best-of-3 reps at local[2] runs
        # ~35-50 min on a quiet window and can exceed 60 on a slow one
        capture_output=True, text=True, cwd=REPO, timeout=7200,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        err = out.stderr.strip().splitlines()
        # the JVM-side Arrow EOF is a symptom (python worker died) —
        # surface any python-side tracebacks too, not just the tail
        hits = [ln for ln in err if re.search(
            r"Error|Exception|Killed|MemoryError|Traceback", ln)][:40]
        raise RuntimeError(
            f"bench.py --cores {cores} --pages {n_pages} produced no JSON "
            f"(rc={out.returncode}); error lines:\n" + "\n".join(hits)
            + "\nstderr tail:\n" + "\n".join(err[-40:])
        )
    return json.loads(lines[-1])


def run_best(cores: int, n_pages: int, reps: int) -> dict:
    """Best-of-N: the sandbox has noisy co-tenants; min wall time is the
    least-contended estimate of the job's actual cost."""
    runs = [run_once(cores, n_pages) for _ in range(reps)]
    return min(runs, key=lambda r: r["queries"]["pipeline_entity_clusters"])


_CEIL_SCRIPT = """
import time
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{c}]")
         .config("spark.ui.enabled","false")
         .config("spark.driver.memory","8g")
         .config("spark.driver.extraJavaOptions","-XX:+UseParallelGC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, 2_000_000_000, 1, {c}*2)
df.agg(F.sum(F.pmod(F.xxhash64("id"), F.lit(1000)))).collect()
t0=time.time()
df.agg(F.sum(F.pmod(F.xxhash64(F.col("id")*7), F.lit(997)))).collect()
print("CEIL", time.time()-t0)
"""


def cpu_ceiling(low: int, high: int) -> dict:
    """Hardware parallel-speedup ceiling: pure codegen CPU aggregation,
    zero shuffle, zero Python. Any job's measured efficiency should be
    judged against this, not against an ideal 4x."""
    times = {}
    for c in (low, high):
        out = subprocess.run(
            [sys.executable, "-c", _CEIL_SCRIPT.format(c=c)],
            capture_output=True, text=True, timeout=600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("CEIL")][-1]
        times[c] = float(line.split()[1])
    sp = times[low] / times[high]
    return {
        "sec_low": round(times[low], 2), "sec_high": round(times[high], 2),
        "speedup": round(sp, 3), "efficiency": round(sp / (high / low), 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    # 1M pages: large enough that parallel compute dominates fixed
    # job/shuffle latency (at 200k, local[32] is overhead-bound and
    # slower than local[8]; at 1M measured efficiency = 0.805)
    ap.add_argument("n_pages", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    # bench.py itself runs best-of-3 data-cold reps per invocation
    # (clearCache between reps, see PLANS.md #16), so one subprocess per
    # core count is already noise-robust
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--session", default="latest",
                    help="label for this row in scaling_runs.jsonl")
    ap.add_argument("--regen", action="store_true",
                    help="regenerate BASELINE.md's scaling section from "
                    "tools/scaling_runs.jsonl without running anything")
    ap.add_argument("--record", nargs=2, type=float, metavar=("SEC_LOW", "SEC_HIGH"),
                    help="log externally-measured pipeline wall times "
                    "(same bench.py invocation shape) instead of re-running "
                    "them; the same-session ceiling microbenchmark still runs")
    args = ap.parse_args()

    log_path = os.path.join(REPO, "tools", "scaling_runs.jsonl")
    if args.regen:
        _write_baseline_section(log_path, args.reps)
        return

    ceiling = cpu_ceiling(args.low, args.high)
    if args.record:
        t_lo, t_hi = args.record
    else:
        lo = run_best(args.low, args.n_pages, args.reps)
        hi = run_best(args.high, args.n_pages, args.reps)
        t_lo = lo["queries"]["pipeline_entity_clusters"]
        t_hi = hi["queries"]["pipeline_entity_clusters"]
    ratio = args.high / args.low
    eff = (t_lo / t_hi) / ratio
    result = {
        "metric": "scaling_efficiency",
        "n_pages": args.n_pages,
        "cores_low": args.low,
        "cores_high": args.high,
        "sec_low": t_lo,
        "sec_high": t_hi,
        "docs_per_sec_low": round(args.n_pages / t_lo, 1),
        "docs_per_sec_high": round(args.n_pages / t_hi, 1),
        "speedup": round(t_lo / t_hi, 3),
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "hw_ceiling": ceiling,
        "efficiency_vs_ceiling": round(eff / max(ceiling["efficiency"], 1e-9), 3),
    }
    print(json.dumps(result))

    # append this run to the cumulative log, then regenerate the
    # BASELINE.md section from ALL logged runs — a single run must not
    # clobber the cross-session evidence (wall times for identical code
    # vary up to ~3x with host co-tenancy)
    entry = {
        "session": args.session,
        "n_pages": args.n_pages,
        "cores_low": args.low, "cores_high": args.high,
        "sec_low": t_lo, "sec_high": t_hi,
        "docs_per_sec_low": result["docs_per_sec_low"],
        "docs_per_sec_high": result["docs_per_sec_high"],
        "efficiency": result["efficiency"],
        "ceiling_efficiency": ceiling["efficiency"],
        "job_over_ceiling": result["efficiency_vs_ceiling"],
    }
    with open(log_path, "a") as fh:
        fh.write(json.dumps(entry) + "\n")
    _write_baseline_section(log_path, args.reps)


def _write_baseline_section(log_path: str, reps: int) -> None:
    runs = [json.loads(ln) for ln in open(log_path) if ln.strip()]

    def fmt(r):
        lo = (f"{r['sec_low']} s / {r['docs_per_sec_low']}"
              if r["sec_low"] else "—")
        hi = (f"{r['sec_high']} s / {r['docs_per_sec_high']}"
              if r["sec_high"] else "—")
        cores = f"{r.get('cores_low', 2)}→{r.get('cores_high', 8)}"
        return (f"| {r['session']} | {r['n_pages']:,} | {cores} | {lo} | {hi} | "
                f"{r['efficiency']} | {r['ceiling_efficiency']} | "
                f"{r['job_over_ceiling']} |")

    effs = [r["efficiency"] for r in runs]
    ceils = [r["ceiling_efficiency"] for r in runs]
    jocs = [r["job_over_ceiling"] for r in runs]
    block = (
        "## Measured scaling (sandbox, flagship ER pipeline)\n\n"
        "Same job, same deterministic input, two parallelism levels "
        "(single-node stand-in for N vs 4N executors per BASELINE.json). "
        "All logged runs of `python tools/scaling.py` (each row best-of-"
        f"{reps} bench-subprocess reps, each rep itself best-of-N "
        "inside the process; the per-session hardware-ceiling "
        "microbenchmark runs alongside each):\n\n"
        "| session | n_pages | cores lo→hi | local[lo] wall / docs/s | "
        "local[hi] wall / docs/s | absolute eff | same-session ceiling "
        "eff | job / ceiling |\n|---|---|---|---|---|---|---|---|\n"
        + "\n".join(fmt(r) for r in runs)
        + "\n\n**Row provenance.** Rows may be logged via `--record` "
        "from bench.py invocations run minutes apart rather than one "
        "subprocess pair (the r2-e 16M row: the per-run `hw_probe_sec` "
        "fixed-work probes — 4.0s at 8 cores, 14.7s at 2 — imply a "
        "0.92 substrate ratio between those two sessions, consistent "
        "with the 0.824 ceiling measured at record time, so the pair "
        "is comparable). The r4-a/r4-b 32M rows share one dedicated "
        "local[8] leg (208.195 s, idle box) and differ only in the "
        "local[2] leg: r4-a's was a dedicated idle-box run (738.659 s), "
        "r4-b's overlapped a 32-thread pytest suite yet came out FASTER "
        "(637.154 s) — tenancy variance, not load, dominates at this "
        "VM; both pairings are reported rather than picking the "
        "flattering one.\n\n"
        "**Methodology break at r2-d.** Rows before `r2-d` were "
        "measured with best-of-3 reps that did NOT clear the Spark "
        "cache between reps; the pipeline persists its docs/keys "
        "frames and Spark's CacheManager substitutes cached plans into "
        "later identical queries, so those minima reflect 1 cold + 2 "
        "partially-cached runs (measured 62s cold vs 19s cache-warm at "
        "4M pages / 8 cores). From `r2-d` on, every rep is data-cold "
        "(`spark.catalog.clearCache()` before each, PLANS.md #16) — "
        "compare absolute docs/sec only within a methodology era; the "
        "efficiency ratios are less affected (both core counts shared "
        "the same flaw).\n\n"
        "**Ratio vs absolute (read this before the efficiency "
        "column).** Rows measure different pipeline configurations; a "
        "config that removes work (e.g. r2-c: MinHash bands off for "
        "title ER, PLANS.md #12) can show HIGHER absolute docs/sec at "
        "every core count yet a LOWER efficiency ratio, because the "
        "removed work was the most parallel-friendly part — a job can "
        "always buy a prettier ratio by adding embarrassingly-parallel "
        "waste. Prefer the best absolute throughput at the target core "
        "count and judge scalability by the ceiling-relative number "
        "alongside it.\n\n"
        "**Hardware ceiling caveat (essential context).** This "
        "Firecracker VM does not deliver linear compute with added "
        "threads, and how much it delivers varies by session: the pure "
        "whole-stage-codegen ceiling (2B-row xxhash sum — zero shuffle, "
        "zero Python, zero disk), measured in the SAME session as each "
        f"run above, spans **{min(ceils)}–{max(ceils)} efficiency over "
        "the same 4x core range** (8→32 threads it is lower still — the "
        "r4-d 8→32 row measured a 0.563 same-session ceiling, which "
        "is why the default N/4N pair is 2/8; note r4-d's JOB still "
        "ran at 1.10x that ceiling). No Spark job can out-scale its "
        "substrate, and wall times for identical code vary up to ~3x "
        "with co-tenancy (see `hw_probe_sec` in BENCH_r{N}.json). An "
        "Amdahl fit shows a non-core-scaling component that GROWS with "
        "input (~29 s at 1M, ~41 s at 4M pages): not constant job-setup "
        "cost but the parts bounded by shared substrate — shuffle-spill "
        "disk bandwidth, memory bandwidth for the cached doc table, "
        "Arrow serialization — which added threads on one throttled VM "
        "cannot speed up, while a real multi-executor cluster adds "
        "disks/memory channels WITH the cores. The absolute >=0.8 "
        "criterion of the north rule targets N vs 4N *executors* on a "
        "cluster; the sandbox evidence is the absolute "
        f"{min(effs)}–{max(effs)} plus the ceiling-relative "
        f"{min(jocs)}–{max(jocs)}, reported together rather than hiding "
        "either. Raw ceiling numbers are in the `hw_ceiling` field of "
        "every run's JSON.\n"
    )
    path = os.path.join(REPO, "BASELINE.md")
    text = open(path).read()
    marker = "## Measured scaling"
    if marker in text:
        text = re.sub(r"## Measured scaling.*\Z", block, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + block
    open(path, "w").write(text)


if __name__ == "__main__":
    main()
