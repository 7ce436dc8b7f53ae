#!/usr/bin/env python3
"""Merge three focused Bench records (sf0.1, sf1 twin, sf10 twin) into
SCALE_sf10.json — the three-decade scale evidence.

Usage: python3 tools/scale_decade.py <bench_sf0.1.json> <bench_sf1.json> \
           <bench_sf10.json> [out.json]

Each input is a SPARK_GRAFT_BENCH_LOCAL record from a focused run
(SPARK_GRAFT_BENCH_ONLY=<families>) at that scale point. The output keys
every family to its three walls and the two per-decade ratios
(r10_1 = sf1/sf0.1, r100_10 = sf10/sf1). A family is flagged
super_linear if its WORST decade ratio exceeds 10 (growth beyond
proportional-to-data within one 10x step) — at these absolute walls a
fixed-cost-dominated family can bounce above the data ratio without
meaning anything, so the flag also requires the sf10 wall to exceed 5 s.
"""
import json
import sys

# Families whose decade ratio is expected to exceed the data ratio for a
# DOCUMENTED structural reason (not a plan defect). They are reported
# under super_linear_explained instead of super_linear.
EXPLAINED = {
    "ann_ivf": (
        "the gate query SET grows with the corpus (every 100th vector), so "
        "the family total grows ~n even though the two-level quantizer's "
        "fixed-candidate-volume probe makes the PER-QUERY cost constant "
        "(nprobeF × ~100-vector fine cells); the remaining growth is "
        "training/assignment passes, which are linear. The production "
        "100 TB shape is ann_ivf_index's DPP-pruned probe, which reads "
        "only the probed fine-cell directories."),
    "ann_lsh": (
        "same query-set-growth shape (queries ∝ n), and the corpus-sized "
        "bucket width adds its third probe ring from 10 bits up (the "
        "width compensation that holds recall >= 0.9 through 13-bit "
        "widths; at the 15-bit third decade the three-ring probed mass "
        "decays and the published floor steps to 0.8 per "
        "AnnOps.annLshFloor) — probe volume grows with the CUBE of the "
        "log of the corpus, so per-query cost is polylog, but the family "
        "total still tracks queries × polylog. LSH is the "
        "data-independent hyperplane alternative; the 100 TB path is the "
        "IVF-PQ tier (ann_ivfpq / ann_ivfpq_index)."),
    "ann_ivfpq_index": (
        "the persisted-index gate query set grows with the corpus (every "
        "100th vector), and the UNION of that many queries' probed cells "
        "approaches every cell — so the DPP-pruned scan degenerates to "
        "reading the whole (code-only, 16x-lighter) inverted file plus "
        "per-cell file overhead that itself grows ~n/256. PER-QUERY cost "
        "is fixed (nprobeF cells x ~target codes); a production workload "
        "with a bounded in-flight query set reads only its probed cells."),
    "ann_ivf_index": (
        "same probed-cell-union shape as ann_ivfpq_index, over float "
        "cells instead of codes."),
    "ann_ivfpq": (
        "query-set growth (queries ∝ n) over a fixed-volume probe, plus "
        "the registered query honestly retrains its two-level index and "
        "residual codebooks per run (training is trainCap-bounded so the "
        "cost saturates, but at small absolute walls it can dominate a "
        "decade ratio). The persisted layout ann_ivfpq_index builds once "
        "and probes thereafter — its entry isolates the query-side cost."),
}


def main():
    paths = sys.argv[1:4]
    out = sys.argv[4] if len(sys.argv) > 4 else "SCALE_sf10.json"
    recs = [json.load(open(p)) for p in paths]
    fams = sorted(set(recs[0]["queries"]) & set(recs[1]["queries"])
                  & set(recs[2]["queries"]))
    families = {}
    flagged, explained = [], {}
    for f in fams:
        w = [r["queries"][f] for r in recs]
        r10 = round(w[1] / w[0], 2) if w[0] > 0 else None
        r100 = round(w[2] / w[1], 2) if w[1] > 0 else None
        # both ratios can be None (sub-5ms family walls round to 0.0 at
        # 2 decimals) — an empty max() would raise, so default to 0.0
        ratios = [x for x in (r10, r100) if x is not None]
        worst = max(ratios) if ratios else 0.0
        sup = worst > 10 and w[2] > 5
        families[f] = {"sf0.1_s": w[0], "sf1_s": w[1], "sf10_s": w[2],
                       "r10_1": r10, "r100_10": r100,
                       "super_linear": sup and f not in EXPLAINED}
        if sup and f in EXPLAINED:
            explained[f] = EXPLAINED[f]
        elif sup:
            flagged.append(f)
    totals = [round(sum(r["queries"][f] for f in fams), 2) for r in recs]
    rec = {
        "families": families,
        "n_families": len(fams),
        "total_s": {"sf0.1": totals[0], "sf1": totals[1], "sf10": totals[2]},
        "total_ratio": {"r10_1": round(totals[1] / totals[0], 2),
                        "r100_10": round(totals[2] / totals[1], 2)},
        "super_linear": flagged,
        "super_linear_explained": explained,
        "loadavg": {"sf0.1": recs[0].get("loadavg"),
                    "sf1": recs[1].get("loadavg"),
                    "sf10": recs[2].get("loadavg")},
        "runs_per_query": [r.get("runs_per_query") for r in recs],
        "excluded": {
            "ann_topk": "declared exact brute-force baseline: its cost is "
                        "the quadratic definition, not a plan property; the "
                        "scale paths ann_lsh/ann_ivf are in the set",
            "ann_pq": "declared compressed exhaustive baseline (queries x "
                      "codes by definition, like ann_topk on a 16x lighter "
                      "scan); its scale path is composing the two-level IVF "
                      "probe with ADC over probed cells only (IVF-PQ)",
            "dedup_embedding": "declared sf-small exact baseline (SURVEY); "
                               "its scale path dedup_semantic is in the set"},
    }
    json.dump(rec, open(out, "w"), indent=1)
    print(json.dumps({"out": out, "n_families": len(fams),
                      "total_s": rec["total_s"],
                      "super_linear": flagged}))


if __name__ == "__main__":
    main()
