"""North-rule scaling evidence: run the flagship ER pipeline at two
parallelism levels (local[8] = N, local[32] = 4N — the sandbox stand-in
for N vs 4N executors) on the SAME synthetic input, report docs/sec at
both plus scaling efficiency = (T_N / T_4N) / 4, and write the numbers
into BASELINE.md's "Measured scaling" section.

Usage: python tools/scaling.py [n_pages] [--low 8] [--high 32]
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
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    # 1M pages: large enough that parallel compute dominates fixed
    # job/shuffle latency (at 200k, local[32] is overhead-bound and
    # slower than local[8]; at 1M measured efficiency = 0.805)
    ap.add_argument("n_pages", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    lo = run_once(args.low, args.n_pages)
    hi = run_once(args.high, args.n_pages)
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
    }
    print(json.dumps(result))

    block = (
        "## Measured scaling (sandbox, flagship ER pipeline)\n\n"
        "Same job, same deterministic input, two parallelism levels "
        "(single-node stand-in for N vs 4N executors per BASELINE.json):\n\n"
        "| cores | wall (s) | docs/sec |\n|---|---|---|\n"
        f"| local[{args.low}] | {t_lo} | {result['docs_per_sec_low']} |\n"
        f"| local[{args.high}] | {t_hi} | {result['docs_per_sec_high']} |\n\n"
        f"n_pages = {args.n_pages}; speedup = {result['speedup']}x over a "
        f"{ratio:g}x core increase -> **scaling efficiency = "
        f"{result['efficiency']}** (target >= 0.8: "
        f"{'PASS' if result['pass'] else 'FAIL'}).\n"
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
