"""Deterministic implementation of BENCH/SCALING_PROTOCOL.md (round 5).

Pools every published paired scaling suite (rounds 3-5; identical binary,
workload = 30M pages/executor, fleets 1x vs 4x pinned 4-core executors),
applies the PRE-REGISTERED symmetric acceptance rule, and emits
BENCH/scaling_pooled_r5.json with the full sensitivity table.

Registered rule (committed before any round-5 suite ran):
  steal-clean  = both halves steal_frac < 0.02
  med1, med4   = per-side medians of makespan over pooled steal-clean pairs
  ACCEPTED     = steal-clean AND m1 in [0.75,1.25]*med1 AND m4 in [0.75,1.25]*med4
  estimator    = median eff over ACCEPTED; gate eff>=0.8 with n_accepted>=15
"""
from __future__ import annotations

import glob
import json
import os
import statistics
import sys

BENCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH")

SUITE_GLOBS = [
    "scaling_exec_r3_suite[LM]_paired*.json",
    "scaling_exec_r4_suite[NOPQR]_paired*.json",
    "scaling_exec_r5_suite*_paired*.json",
]


def load_pairs() -> list[dict]:
    pairs: list[dict] = []
    for pat in SUITE_GLOBS:
        for f in sorted(glob.glob(os.path.join(BENCH, pat))):
            suite = f.split("suite")[1].split("_")[0]
            try:
                d = json.load(open(f))
            except json.JSONDecodeError:
                print(f"# skipping unreadable/in-progress {f}", file=sys.stderr)
                continue
            for i, p in enumerate(d["pairs"]):
                pairs.append(
                    {
                        "suite": suite,
                        "pair": i,
                        "m1": p["1"]["makespan"],
                        "m4": p["4"]["makespan"],
                        "s1": p["1"]["steal_frac"],
                        "s4": p["4"]["steal_frac"],
                        "eff": p["eff"],
                    }
                )
    return pairs


def median_eff(rows: list[dict]) -> float | None:
    return round(statistics.median(r["eff"] for r in rows), 3) if rows else None


def main() -> None:
    pairs = load_pairs()
    steal_clean = [p for p in pairs if p["s1"] < 0.02 and p["s4"] < 0.02]
    if not steal_clean:
        sys.exit("no steal-clean pairs")
    med1 = statistics.median(p["m1"] for p in steal_clean)
    med4 = statistics.median(p["m4"] for p in steal_clean)
    accepted = [
        p
        for p in steal_clean
        if 0.75 * med1 <= p["m1"] <= 1.25 * med1
        and 0.75 * med4 <= p["m4"] <= 1.25 * med4
    ]
    no_gt1 = [p for p in steal_clean if p["eff"] <= 1.0]
    trim = [p for p in steal_clean if 0.6 <= p["eff"] <= 1.05]

    sensitivity = {
        "all": {"n": len(pairs), "median_eff": median_eff(pairs)},
        "steal_clean": {"n": len(steal_clean), "median_eff": median_eff(steal_clean)},
        "no_gt1": {"n": len(no_gt1), "median_eff": median_eff(no_gt1)},
        "trim_0.6_1.05": {"n": len(trim), "median_eff": median_eff(trim)},
        "accepted": {"n": len(accepted), "median_eff": median_eff(accepted)},
    }
    est = sensitivity["accepted"]["median_eff"]
    out = {
        "metric": "tile_assignment_executor_scaling_pooled_registered_rule",
        "value": est,
        "unit": "efficiency_1_to_4_executors_median_accepted_pair",
        "protocol": "BENCH/SCALING_PROTOCOL.md",
        "gate": "accepted median >= 0.8, n_accepted >= 15; verdict also requires no_gt1 >= 0.8",
        "pass": bool(
            est is not None
            and est >= 0.8
            and len(accepted) >= 15
            and sensitivity["no_gt1"]["median_eff"] >= 0.8
        ),
        "pooled_medians": {"med_m1": round(med1, 2), "med_m4": round(med4, 2)},
        "acceptance_band": {
            "m1": [round(0.75 * med1, 2), round(1.25 * med1, 2)],
            "m4": [round(0.75 * med4, 2), round(1.25 * med4, 2)],
        },
        "sensitivity": sensitivity,
        "accepted_pairs": [
            {k: p[k] for k in ("suite", "pair", "eff", "m1", "m4")} for p in accepted
        ],
        "rejected_steal_clean_pairs": [
            {k: p[k] for k in ("suite", "pair", "eff", "m1", "m4")}
            for p in steal_clean
            if p not in accepted
        ],
    }
    path = os.path.join(BENCH, "scaling_pooled_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["sensitivity"], indent=1))
    print(f"estimator={est} n_accepted={len(accepted)} pass={out['pass']}")


if __name__ == "__main__":
    main()
