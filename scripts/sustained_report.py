"""Sustained-throughput report for a real training run.

Reads a run directory's `metrics.jsonl` (per-100-step windows logged by
`phiseg_tpu.engine.trainer`) and reports the distribution of
between-validation window throughput plus the whole-run effective rate.

Why both: the per-window *median* is what the loop sustains when the axon
tunnel is healthy; the *whole-run* rate folds in validation passes and the
tunnel's bandwidth troughs (CLAUDE.md: 30-600 img/s at constant code).
The gap between them is the measured tunnel/validation tax that
VERDICT round-2 item 4 asked to be attributed rather than hidden.

Usage:
  python scripts/sustained_report.py logs/lidc_ms/phiseg_7_5_ms [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics


def report(run_dir: str) -> dict:
    path = os.path.join(run_dir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    ips = [r["images_per_sec"] for r in rows if r.get("images_per_sec", 0) > 0]
    if len(ips) < 3:
        raise SystemExit(f"{path}: only {len(ips)} throughput windows")
    s = sorted(ips)
    n = len(s)
    out = {
        "run": run_dir,
        "windows": n,
        "steps": rows[-1]["step"] - rows[0]["step"],
        "median_images_per_sec": round(statistics.median(s), 1),
        "mean_images_per_sec": round(statistics.fmean(s), 1),
        "p10_images_per_sec": round(s[n // 10], 1),
        "p90_images_per_sec": round(s[(9 * n) // 10], 1),
        # Harmonic mean = time-weighted true throughput of the logged
        # windows (each window covers the same number of steps, so wall
        # time per window is inversely proportional to its rate).
        "harmonic_mean_images_per_sec": round(n / sum(1.0 / v for v in s), 1),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    for d in args.run_dirs:
        r = report(d)
        if args.json:
            print(json.dumps(r))
        else:
            print(
                f"{r['run']}: {r['windows']} windows over {r['steps']} steps | "
                f"median {r['median_images_per_sec']} img/s, "
                f"harmonic mean {r['harmonic_mean_images_per_sec']}, "
                f"p10 {r['p10_images_per_sec']}, p90 {r['p90_images_per_sec']}"
            )


if __name__ == "__main__":
    main()
