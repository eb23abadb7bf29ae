#!/usr/bin/env python3
"""Machine check of the COVERAGE.md ratio-screen rule (dev-side).

Rule: any query whose sf0.1->sf1 bench ratio exceeds 3x must carry one
of (a) a labeled-baseline marker, (b) a measured output-growth note,
(c) a policy arm beside it. The discharge table below encodes the
COVERAGE.md "Ratio-screen rule" section; a >3x query missing from it
is a VIOLATION the round must either fix or document.

Noise discipline: the per-query MEDIAN ratio triggers the screen, but a
query is only a hard violation if its MIN ratio also exceeds 3x
(min-of-3 is the record's stable column; a median-only exceedance is
reported as dispersion, not structure).

Materiality floor (r10, DERIVED from the record since r11): the screen
hunts SCALE-KILLERS - operators whose growth would dominate a 100 TB
run. A query whose sf1 median is under the floor cannot be one: its
ratio is a fixed-overhead noise quotient over a small denominator
(measured: cdc_apply / token_count / value_buckets bounce 2.0-3.9x
between SAME-CODE r10 capture pairs while their sf1 absolute cost
stays ~1-2.6 s). The floor is computed from the sf1 capture's own
control shapes: 4 x the canary_join median - the join canary is the
largest of the three controls, so the floor reads "a query whose whole
sf1 run costs less than four control joins is inside the fixed-overhead
regime". Calibration: the measured same-code noise cohort sits at
1.2-3.0 join-units absolute, so 4 units covers it with one unit of
margin (r10 record: 4 x 0.86 = 3.44 s, reproducing the r10 verdicts);
the floor scales with the box instead of hard-coding this one's noise.
Records without canaries fall back to the r10 constant 3.0 s.
Structural offenders read 5-90 s at sf1 and are unaffected.

Repeat-warn ledger (r10 ADVICE): an immaterial-but-min-confirmed
exceedance is waved through only while it stays cheap. Each such warn
is recorded in a history file (default RATIO_WARNS.json beside the
records) keyed by query with the first-seen sf1 MIN cost; if the same
query warns again with its min cost grown >= GROWTH_FAIL x the
first-seen value, the screen FAILS it - a genuinely superlinear
operator surfaces as soon as it starts getting expensive instead of
warning indefinitely.

Growth-gate normalization (r11 ADVICE): the raw-seconds comparison
would flip every repeat warn into a FAIL on a ~1.5x slower box - the
exact cross-box artifact the canary-derived floor absorbs. So the
first-seen min is stored (and compared) in CANARY_JOIN UNITS
(min / the capture's own canary_join median), scaling the growth test
with the box like the floor does. Ledger entries written before the
units field are backfilled from their first-seen record's canaries
when that record sits beside the ledger; failing that, the raw-seconds
comparison applies (better a false fail than a silent superlinear op).

Usage: python3 tools/ratio_screen.py BENCH_SF01_rN.json BENCH_SF1_rN.json [warns.json]
Exit 1 on violations.
"""
import sys, json, os, statistics

FALLBACK_MATERIAL_SEC = 3.0  # pre-canary records only
CANARY_UNITS = 4.0           # floor = 4 x canary_join median (see module doc)
GROWTH_FAIL = 1.5            # repeat immaterial warn fails once min cost grows 1.5x

# name -> (rule clause, one-line reason)  [COVERAGE.md discharge table]
ALLOWED = {
    "cosine_topk":        ("a", "exact quadratic baseline of the ANN family"),
    "ann_rp_rerank":      ("a", "brute JL baseline; arm ann_rp_rerank_scaled"),
    "pq_topk":            ("a", "brute ADC baseline; arm ann_ivfpq_scaled"),
    "ann_ivfpq_topk":     ("a", "fixed-cell baseline; arm ann_ivfpq_scaled"),
    "ann_ivf_topk":       ("a", "fixed-cell baseline; arm ann_ivf_scaled"),
    "ann_ivf_multiprobe": ("a+c", "fixed-label-cell baseline; arm ann_ivf_scaled"),
    "knn_graph":          ("a", "fixed-block baseline; arm knn_graph_bucketed"),
    "knn_classify":       ("a", "baseline; arm knn_classify_scaled"),
    "hard_negatives":     ("a", "baseline; arm hard_negatives_scaled"),
    "knn_triangles":      ("a", "baseline; arm knn_triangles_scaled"),
    "link_prediction":    ("a", "baseline; arm link_prediction_scaled"),
    "bm25_topk":          ("a", "untruncated baseline; arm bm25_pruned"),
    "rrf_hybrid":         ("a", "brute-fusion baseline; arm rrf_hybrid_scaled"),
    "semantic_dedup":     ("a", "baseline; arms semantic_dedup_scaled/_indexed"),
    "ann_lsh_topk":       ("a", "fixed-plane baseline; arm ann_lsh_multiprobe/policy"),
    "ann_hamming_rerank": ("a", "flat-scan baseline; arm ann_hamming_scaled"),
    "ann_index_topk":     ("a", "fixed-plane LSH probe; policy siblings "
                                "ann_index_hamming/_ivf hold 2.2x/1.5x"),
    "ann_index_hamming":  ("c", "IS the sketch-probe policy sibling; sf1 "
                                "absolute cost FLAT across captures (r11 "
                                "5.12 s -> r12 5.51 s raw at ambient 1.10 "
                                "= ~5.03 s normalized) - the r12 3.4x is "
                                "the sf0.1 denominator improving (1.92 -> "
                                "1.64 s at ambient 0.98), the "
                                "ann_rp_rerank_scaled crossing pattern, "
                                "not growth"),
    "mips_topk":          ("a", "brute MIPS baseline (sampled-query x "
                                "corpus raw-dot scan, the cosine_topk "
                                "shape); arm mips_lsh_topk holds ~1.9x "
                                "per decade"),
    "range_pairs":        ("b", "output 232k -> 32.2M rows (139x) for 10x events"),
    "dedup_embedding":    ("b", "output pairs 391 -> 42161 (108x) for 10x vectors"),
    "candles_gap_filled": ("b", "output rows ~10x (gap spine scales with span)"),
    "winnow_fingerprints":("b", "linear per-doc fingerprint output, 10x rows"),
    "winnow_pairs":       ("b", "linear fingerprint volume feeding the pair join"),
    "tfidf_top_terms":    ("b", "per-document linear token work; sublinear vs 10x"),
    "dup_ngram_pairs":    ("b", "verbatim-span pair output grows with dup mass"),
    "kcore_nodes":        ("b", "synchronous peeling, O(|E|) per unrolled round "
                                "(r6 audit); edges 10x"),
    "hard_negatives_scaled": ("c", "IS the label-family policy arm; the r7 "
                                "decade law measures ~2.9-3.4x/decade "
                                "(per-block occupancy under label+3-bit blocks)"),
    "quantized_topk":     ("a", "SQ8 variant of the cosine_topk brute scan "
                                "(quadratic over int8 codes; cheaper constant, "
                                "same shape) — ANN arms are the scale path"),
    "label_communities":  ("b", "label-propagation rounds over 10x edges"),
    "ann_rp_rerank_scaled": ("c", "IS the JL policy arm; measured 2.6-3.3x "
                                "per decade across the r8-r10 captures with "
                                "sf1 absolute cost FLAT (4.2-4.9 s) - the r10 "
                                "crossing is the sf0.1 denominator improving "
                                "with round ambience (canary 0.84-0.93), not "
                                "growth; occupancy-grown candidates, the "
                                "hard_negatives_scaled law"),
    "bm25_pruned":        ("b", "linear shape at the screen boundary: index "
                                "build (tf/df/truncation window) is linear in "
                                "corpus and per-query candidates are bounded "
                                "at terms x maxPostings with queries prop. to "
                                "corpus; measured 2.8-3.1x at min AND median "
                                "across the r9/r10 capture pairs - straddles "
                                "the 3x heuristic line, no superlinear term"),
    "value_quantiles":    ("b", "exact rank selection over 10x rows"),
}

def canary_unit(record):
    """canary_join median of a capture, or None (pre-canary record)."""
    canaries = record.get("canary_runs_sec")
    if not canaries or "canary_join" not in canaries:
        return None
    return statistics.median(canaries["canary_join"])


def derived_floor(sf1_record):
    unit = canary_unit(sf1_record)
    if unit is None:
        print(f"materiality floor: {FALLBACK_MATERIAL_SEC:.2f} s "
              "(record lacks canaries — r10 fallback constant)")
        return FALLBACK_MATERIAL_SEC
    floor = CANARY_UNITS * unit
    print(f"materiality floor: {floor:.2f} s "
          f"(= {CANARY_UNITS:.0f} x canary_join median {unit:.3f} s at sf1)")
    return floor


def first_min_units(h, unit, ledger_dir):
    """First-seen min in canary_join units, backfilling pre-units ledger
    entries from their first-seen record when it sits beside the ledger.
    Returns None when no units basis exists (caller falls back to raw)."""
    if h is None or unit is None:
        return None
    if "first_min_units" in h:
        return h["first_min_units"]
    for rec in h.get("records", [])[:1]:
        p = os.path.join(ledger_dir, rec)
        if os.path.exists(p):
            u0 = canary_unit(json.load(open(p)))
            if u0:
                h["first_min_units"] = round(h["first_min_sf1_sec"] / u0, 4)
                return h["first_min_units"]
    return None


def main(sf01_path, sf1_path, warns_path=None):
    a = json.load(open(sf01_path))
    b = json.load(open(sf1_path))
    qa, qb = a["queries"], b["queries"]
    ta = a.get("runs_min_med_max", {})
    tb = b.get("runs_min_med_max", {})
    material_sec = derived_floor(b)
    unit = canary_unit(b)
    if warns_path is None:
        warns_path = os.path.join(os.path.dirname(os.path.abspath(sf1_path)),
                                  "RATIO_WARNS.json")
    ledger_dir = os.path.dirname(os.path.abspath(warns_path))
    history = json.load(open(warns_path)) if os.path.exists(warns_path) else {}
    violations, dispersion, discharged = [], [], []
    for name in sorted(qa):
        if name not in qb or qa[name] <= 0.15:  # sub-noise-floor queries
            continue
        med = qb[name] / qa[name]
        if med <= 3.0:
            continue
        mn = (tb[name][0] / ta[name][0]) if name in ta and name in tb \
             and ta[name][0] > 0 else med
        if name in ALLOWED:
            clause, why = ALLOWED[name]
            discharged.append(f"  ok   {name:24s} med {med:5.1f}x min {mn:5.1f}x  ({clause}) {why}")
        elif mn <= 3.0:
            dispersion.append(f"  warn {name:24s} med {med:5.1f}x min {mn:5.1f}x  median-only exceedance (dispersion)")
        elif qb[name] < material_sec:
            cur_min = tb[name][0] if name in tb else qb[name]
            h = history.get(name)
            # growth gate in canary_join units when a units basis exists
            # (r11 ADVICE: raw seconds would fail every repeat warn on a
            # ~1.5x slower box); raw-seconds fallback otherwise
            fm_units = first_min_units(h, unit, ledger_dir)
            if fm_units is not None:
                grown = (cur_min / unit) >= GROWTH_FAIL * fm_units
                grown_msg = (f"sf1 min {cur_min / unit:.2f} cu >= {GROWTH_FAIL}x "
                             f"first-seen {fm_units:.2f} cu (canary_join units)")
            elif h is not None:
                grown = cur_min >= GROWTH_FAIL * h["first_min_sf1_sec"]
                grown_msg = (f"sf1 min {cur_min:.2f} s >= {GROWTH_FAIL}x "
                             f"first-seen {h['first_min_sf1_sec']:.2f} s (raw — no canary basis)")
            else:
                grown, grown_msg = False, ""
            if grown:
                violations.append(
                    f"  FAIL {name:24s} med {med:5.1f}x min {mn:5.1f}x  repeat immaterial warn with GROWN cost: "
                    f"{grown_msg} "
                    f"(warned {h['warn_count']}x before) — no longer noise, discharge or fix it")
            else:
                # idempotent per record: re-screening the same capture
                # (judge re-runs, dev iterations) must not inflate the count
                rec = os.path.basename(sf1_path)
                seen = h.get("records", []) if h else []
                if rec not in seen:
                    seen = seen + [rec]
                count = len(seen)
                first = h["first_min_sf1_sec"] if h else cur_min
                entry = {"first_min_sf1_sec": first,
                         "warn_count": count, "records": seen}
                if fm_units is not None:
                    entry["first_min_units"] = fm_units
                elif h is None and unit is not None:
                    entry["first_min_units"] = round(cur_min / unit, 4)
                history[name] = entry
                basis = (f"{entry['first_min_units']:.2f} cu"
                         if "first_min_units" in entry else f"{first:.2f} s")
                dispersion.append(
                    f"  warn {name:24s} med {med:5.1f}x min {mn:5.1f}x  immaterial at sf1 ({qb[name]:.2f} s absolute < "
                    f"{material_sec:.2f} s floor) — noise quotient, not a scale-killer "
                    f"[warn #{count}; fails if sf1 min grows {GROWTH_FAIL}x over {basis}]")
        else:
            violations.append(f"  FAIL {name:24s} med {med:5.1f}x min {mn:5.1f}x  undischarged — add a baseline label, output-growth note, or policy arm")
    for line in discharged + dispersion + violations:
        print(line)
    with open(warns_path, "w") as f:
        json.dump(history, f, indent=1, sort_keys=True)
    print(f"\n{len(discharged)} discharged, {len(dispersion)} dispersion-only, "
          f"{len(violations)} violations  [warn ledger: {warns_path}]")
    return 1 if violations else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
