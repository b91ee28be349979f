#!/usr/bin/env python
"""Weak-scaling evidence (BASELINE.md §3): constant per-core load.

Runs the Arrow-UDAF token-sketch job at N cores over a small fixture and at
4N cores over a 4x fixture (same tokens-per-core), taskset-bound process
trees (the executor-container analog), INTERLEAVED so both levels sample
the same host-steal regime.  Weak-scaling efficiency per adjacent pair is
t_small / t_big (1.0 = perfect: 4x the data on 4x the cores in the same
wall-clock).  r4 measured this ad hoc (bench_results/weak_scaling_r4.json,
storm-hit 8-core side); this script makes the protocol reproducible —
steal check, per-round pairs, raw runs preserved (VERDICT r4 item 4).

Run:  python jobs/weak_scaling.py [--n 2] [--rounds 3] [--docs-per-core 37500]
      [--workload udaf_tokens] [--wait-quiet] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jobs.scaling_bench import _one_subprocess, steal_pct, wait_quiet  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="N cores; 4N is run too")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--docs-per-core", type=int, default=37_500)
    ap.add_argument("--workload", default="udaf_tokens")
    ap.add_argument("--wait-quiet", action="store_true")
    ap.add_argument("--out")
    args = ap.parse_args()

    from ddsketch_spark.sources.fixtures import generate_tokens_table

    import pyarrow.parquet as pq

    def _tok_count(path: str) -> int:
        return int(pq.read_table(path, columns=["n_tok"])["n_tok"].to_numpy().sum())

    small_path = generate_tokens_table(args.docs_per_core * args.n)
    big_path = generate_tokens_table(args.docs_per_core * args.n * 4)
    result: dict = {
        "protocol": (
            f"affinity weak scaling: {args.n} cores @ {args.docs_per_core * args.n} "
            f"docs vs {4 * args.n} cores @ {args.docs_per_core * args.n * 4} docs "
            f"(constant per-core load), taskset-bound process tree, interleaved, "
            f"3 timed runs per subprocess, best-of per round"
        ),
        "workload": args.workload,
        "tokens_small": _tok_count(small_path),
        "tokens_big": _tok_count(big_path),
        "steal_pct_at_start": round(
            wait_quiet() if args.wait_quiet else steal_pct(), 2
        ),
        "runs_small_sec": [],
        "runs_big_sec": [],
        "pairwise_efficiencies": [],
    }
    for _ in range(args.rounds):
        s_small = _one_subprocess(args.n, small_path, args.workload, affinity=True)
        s_big = _one_subprocess(4 * args.n, big_path, args.workload, affinity=True)
        result["runs_small_sec"].extend(round(s, 3) for s in s_small)
        result["runs_big_sec"].extend(round(s, 3) for s in s_big)
        result["pairwise_efficiencies"].append(round(min(s_small) / min(s_big), 3))
    best_small = min(result["runs_small_sec"])
    best_big = min(result["runs_big_sec"])
    result["best_small_sec"] = best_small
    result["best_big_sec"] = best_big
    result["weak_scaling_efficiency_aggregate"] = round(best_small / best_big, 3)
    result["weak_scaling_efficiency_best_pair"] = max(
        result["pairwise_efficiencies"]
    )
    out = json.dumps(result, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
