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

Min-confirmation rule (r9 finding, codified per the r9 verdict): the
SHORT canary shapes normalize uniform ambience but cannot see
per-query interference modes — `bm25_topk` at sf1 read
[21.4, 82.2, 86.9] s in one capture and [23.3, 23.5, 103.9] in a
SAME-CODE capture (canary factor 1.03, median moved 3.5x, min stable
at ~22 s), and `bipower_var` moved 1.6x in median with its min at
1.27x in the same pair. A median-only comparison re-litigates those by
hand every round. So whenever BOTH records carry `runs_min_med_max`, a
median exceedance alone is DISPERSION; the flag requires the
canary-normalized MIN-column ratio to exceed the threshold too — the
min is the least-interference observation of the same plan (the
ratio_screen.py min-of-runs discipline), and a genuine code regression
moves the min with the median while box interference moves only the
upper runs. Records without `runs_min_med_max` (pre-r9) fall back to
median-only with a warning.

Grandparent check (r11 finding, codified): min-confirmation assumes
the OLD capture's min is a stable floor, but a min can itself be the
lucky draw — `tfidf_top_terms` read in-suite mins of 3.23 / 2.54 /
3.92 s across three same-code rounds, so the r10→r11 comparison
min-confirmed a "regression" that the r9→r11 comparison (1.21x) and a
standalone rerun (steady state BELOW every in-suite min) both refute.
When a GRANDPARENT record (the round before OLD) is supplied, a
flagged query whose canary-normalized min ratio vs the grandparent is
under threshold is downgraded to dispersion with an "old-min outlier"
note — two independent baselines must agree before the tool calls a
regression.

Materiality floor (r11, same derivation as ratio_screen.py): canary
normalization assumes a query's cost scales with ambient box speed,
which holds for data-bound work but NOT for the fixed per-query
overheads (planning, codegen, driver round-trips, GC) that dominate
sub-second queries — on a 25%-faster box those queries read as
"canary-normalized regressions" because their floor cost did not
shrink with the canaries (`pipeline_metrics`: in-suite min 1.06 s vs
0.79 on a slower box, standalone steady state 0.52-0.86 s, sf0.1 row
IMPROVED on the same code). A flagged query whose NEW absolute median
is under 4 x the new record's canary_join median is therefore
reported as immaterial drift (dispersion), UNLESS its raw ratio is
>= 3x — a genuine order-of-magnitude blowup of a formerly-tiny query
must still flag.

Usage: python3 tools/drift_check.py OLD.json NEW.json [threshold=1.5] [GRANDPARENT.json]
Exit 1 if any query's canary-normalized slowdown exceeds threshold
(min-confirmed where run triples are available; grandparent-refuted
and sub-floor immaterial flags are dispersion).
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


def main(old_path, new_path, threshold=1.5, gp_path=None):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    fac = canary_factor(old, new)
    if fac is None:
        print("WARN: one record lacks canary_runs_sec (pre-r9) — "
              "raw ratios only, ambient drift NOT separable")
        fac = 1.0
    else:
        print(f"ambient factor (median canary ratio new/old): {fac:.3f}")
    gp, gp_fac, rg = None, None, {}
    if gp_path:
        gp = json.load(open(gp_path))
        gp_fac = canary_factor(gp, new) or 1.0
        rg = gp.get("runs_min_med_max") or {}
        print(f"grandparent: {gp_path} (ambient factor vs new: {gp_fac:.3f})")
    qo, qn = old["queries"], new["queries"]
    ro = old.get("runs_min_med_max") or {}
    rn = new.get("runs_min_med_max") or {}
    ncan = new.get("canary_runs_sec") or {}
    floor = 4.0 * statistics.median(ncan["canary_join"]) \
        if "canary_join" in ncan else 0.0
    if floor:
        print(f"materiality floor: {floor:.2f} s "
              "(fixed-overhead regime; sub-floor flags downgrade unless raw >= 3x)")
    flagged, dispersion, improved = [], [], []
    for name in sorted(set(qo) & set(qn)):
        if qo[name] <= 0.15:  # sub-noise-floor
            continue
        raw = qn[name] / qo[name]
        norm = raw / fac
        if norm > threshold and qn[name] < floor and raw < 3.0:
            print(f"  note: {name} canary-normalized {norm:.2f}x but "
                  f"absolute cost {qn[name]:.2f} s is under the "
                  f"{floor:.2f} s fixed-overhead floor (raw {raw:.2f}x) — "
                  "immaterial drift; dispersion")
            dispersion.append((norm, raw, float("nan"), name))
        elif norm > threshold:
            # confirm on the min column before calling it a regression
            if name in ro and name in rn and ro[name][0] > 0:
                min_norm = (rn[name][0] / ro[name][0]) / fac
                if min_norm > threshold:
                    # second baseline: a flag the grandparent refutes is
                    # an old-min outlier, not a regression
                    if name in rg and rg[name][0] > 0 and \
                       (rn[name][0] / rg[name][0]) / gp_fac <= threshold:
                        gp_norm = (rn[name][0] / rg[name][0]) / gp_fac
                        print(f"  note: {name} min-confirmed vs OLD but "
                              f"grandparent-stable ({gp_norm:.2f}x) — "
                              "old min was the outlier; dispersion")
                        dispersion.append((norm, raw, min_norm, name))
                    else:
                        flagged.append((norm, raw, min_norm, name))
                else:
                    dispersion.append((norm, raw, min_norm, name))
            else:
                if name not in ro or name not in rn:
                    print(f"WARN: {name} exceeds threshold but a record lacks "
                          "runs_min_med_max — median-only flag")
                else:
                    print(f"WARN: {name} exceeds threshold but the old min is "
                          f"non-positive ({ro[name][0]}) — median-only flag, "
                          "min-confirmation unavailable")
                flagged.append((norm, raw, float("nan"), name))
        elif norm < 1.0 / threshold:
            improved.append((norm, raw, name))
    for norm, raw, mn, name in sorted(flagged, reverse=True):
        extra = f"  min-normalized {mn:5.2f}x" if mn == mn else ""
        print(f"  REGRESSION? {name:26s} raw {raw:5.2f}x  canary-normalized {norm:5.2f}x{extra}")
    for norm, raw, mn, name in sorted(dispersion, reverse=True):
        tail = f"  min-normalized {mn:5.2f}x (min stable)" if mn == mn \
            else "  (immaterial: under the fixed-overhead floor)"
        print(f"  dispersion  {name:26s} raw {raw:5.2f}x  canary-normalized {norm:5.2f}x{tail}")
    for norm, raw, name in sorted(improved):
        print(f"  improved    {name:26s} raw {raw:5.2f}x  canary-normalized {norm:5.2f}x")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(f"  new queries (no old row): {', '.join(only_new)}")
    print(f"\n{len(flagged)} suspected regressions, {len(dispersion)} "
          f"dispersion, {len(improved)} improvements, threshold {threshold}x")
    return 1 if flagged else 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    gp = sys.argv[4] if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], t, gp))
