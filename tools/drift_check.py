#!/usr/bin/env python3
"""Canary-normalized cross-round bench comparison (dev-side).

The r8 verdict's finding: untouched operators read 1.3-1.7x slower
round-over-round purely from box ambience, so raw per-query deltas
cannot distinguish drift from regression. Since r9 the bench records
carry three frozen canary shapes (scan/agg/join) per sweep
(`canary_runs_sec`). This tool reads two records AT THE SAME SCALE
FACTOR, computes the ambient factor as the median canary ratio, and
reports per-query deltas divided by it — only normalized slowdowns
beyond the threshold are flagged as suspected regressions.

Usage: python3 tools/drift_check.py OLD.json NEW.json [threshold=1.5]
Exit 1 if any query's canary-normalized slowdown exceeds threshold.
"""
import sys, json, statistics


def canary_factor(old, new):
    co, cn = old.get("canary_runs_sec"), new.get("canary_runs_sec")
    if not co or not cn:
        return None  # pre-r9 record: no in-artifact control
    ratios = [statistics.median(cn[k]) / statistics.median(co[k])
              for k in sorted(set(co) & set(cn))
              if statistics.median(co[k]) > 0]
    return statistics.median(ratios) if ratios else None


def main(old_path, new_path, threshold=1.5):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    fac = canary_factor(old, new)
    if fac is None:
        print("WARN: one record lacks canary_runs_sec (pre-r9) — "
              "raw ratios only, ambient drift NOT separable")
        fac = 1.0
    else:
        print(f"ambient factor (median canary ratio new/old): {fac:.3f}")
    qo, qn = old["queries"], new["queries"]
    flagged, improved = [], []
    for name in sorted(set(qo) & set(qn)):
        if qo[name] <= 0.15:  # sub-noise-floor
            continue
        raw = qn[name] / qo[name]
        norm = raw / fac
        if norm > threshold:
            flagged.append((norm, raw, name))
        elif norm < 1.0 / threshold:
            improved.append((norm, raw, name))
    for norm, raw, name in sorted(flagged, reverse=True):
        print(f"  REGRESSION? {name:26s} raw {raw:5.2f}x  canary-normalized {norm:5.2f}x")
    for norm, raw, name in sorted(improved):
        print(f"  improved    {name:26s} raw {raw:5.2f}x  canary-normalized {norm:5.2f}x")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(f"  new queries (no old row): {', '.join(only_new)}")
    print(f"\n{len(flagged)} suspected regressions, {len(improved)} improvements, "
          f"threshold {threshold}x")
    return 1 if flagged else 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
