#!/usr/bin/env python3
"""Calibration-normalized bench comparison.

Raw cross-run seconds are incomparable on this box (measured ~40-60%
drift within an hour — SURVEY.md §6); the only meaningful round-over-round
comparison scales the prior run's per-query seconds by
(calibration_now / calibration_prior) first. This is the same arithmetic
as Bench's `suspect` gate (BenchSpec pins it), applied to the full map
with human-readable output.

Usage:
  python3 tools/compare_bench.py <prior.json> [<current.json>]
  # current defaults to ./bench-out.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        obj = json.load(f)
    # the driver's BENCH_r*.json artifacts wrap the bench line under
    # {"parsed": {...}} — unwrap so driver artifacts and raw bench-out.json
    # compare with the same command
    if "queries" not in obj and isinstance(obj.get("parsed"), dict):
        obj = obj["parsed"]
    return obj


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    prior = load(sys.argv[1])
    cur = load(sys.argv[2] if len(sys.argv) > 2 else "bench-out.json")
    cp, cc = prior.get("calibration_sec"), cur.get("calibration_sec")
    scale = (cc / cp) if cp and cc and cp > 0 else 1.0
    print(f"calibration: prior={cp} current={cc} scale={scale:.3f}"
          + ("" if cp else "  (no prior calibration: RAW compare)"))
    qp, qc = prior["queries"], cur["queries"]
    shared = [k for k in qc if k in qp and qp[k] > 0 and qc[k] > 0]
    tot_p = sum(qp[k] for k in shared)
    tot_c = sum(qc[k] for k in shared)
    print(f"shared {len(shared)} queries: prior {tot_p:.1f}s "
          f"(normalized {tot_p * scale:.1f}s) -> current {tot_c:.1f}s "
          f"({(tot_c / (tot_p * scale) - 1) * 100:+.1f}% normalized)")

    def movers(pred, label):
        rows = sorted(((qc[k] / (qp[k] * scale), k) for k in shared
                       if pred(qc[k], qp[k] * scale)), reverse=True)
        if rows:
            print(label)
            for r, k in rows:
                print(f"  {k}: {qp[k]:.2f}s -> {qc[k]:.2f}s ({r:.2f}x normalized)")

    # the same thresholds as the ad-hoc round reviews: a mover must be both
    # 1.5x off normalized AND 0.3s absolute (sub-100ms queries triple on
    # scheduler noise alone)
    movers(lambda c, p: c > p * 1.5 and c - p > 0.3, "slower (>1.5x norm, >0.3s):")
    movers(lambda c, p: c * 1.5 < p and p - c > 0.3, "faster (>1.5x norm, >0.3s):")
    new = sorted(k for k in qc if k not in qp)
    if new:
        print("new queries: " + ", ".join(f"{k} {qc[k]:.2f}s" for k in new))
    gone = sorted(k for k in qp if k not in qc)
    if gone:
        print("removed queries: " + ", ".join(gone))


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. `| head` closing stdout early
        import os
        os._exit(0)
