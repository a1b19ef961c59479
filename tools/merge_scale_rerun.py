#!/usr/bin/env python3
"""Fold subset ScaleProbe re-measures into BENCH_SCALE.json.

The probe's exponent is a ratio of per-side MINs; in a contended window
the two sides' MINs land in different ambient levels and the ratio
inflates (the r16 30x ssjoin read 0.95 from a base MIN that was 30%
below its own sibling samples). The documented remedy is the MIN rule
over MORE runs: a subset re-run (SPARK_GRAFT_ONLY + SPARK_GRAFT_OUT)
writes its own artifact, and this script folds the cross-run MIN per
side back into the full record, recomputes ratio/exponent/flags, and
stamps a `notes` entry naming the rerun artifact so the merge is
auditable in-artifact.

Usage: merge_scale_rerun.py RERUN_JSON [RERUN_JSON...]
"""
import json
import math
import sys

MAIN = "/root/repo/BENCH_SCALE.json"


def fold_level(dst, src, factor, note_rows):
    if not dst or not src:
        return
    thr = dst.get("threshold", 1.3)
    # Flags: ScaleProbe decides on UNROUNDED exponents but stores 2-dp
    # values, so recomputing every row's flag from the stored artifact
    # can flip a query sitting within ~0.005 of the threshold on any
    # unrelated merge. Keep untouched rows at their prior membership;
    # re-decide ONLY rows this merge actually changed, on the unrounded
    # value computed here (the same quantity ScaleProbe flags on).
    flagged = set(dst.get("flagged", []))
    src_flagged = set(src.get("flagged", []))
    for q, row in src.get("queries", {}).items():
        cur = dst["queries"].get(q)
        # a failed rerun row carries no base/scaled keys — skip it;
        # a failed STORED row is healed by a successful rerun (it
        # takes the upsert path below rather than staying sticky)
        if row.get("failed"):
            continue
        if cur is not None and cur.get("failed"):
            cur = None
        if cur is None:
            # UPSERT (round 17): a query newly admitted to the pool
            # (ProbePoolSpec floor rule) — or healing a failed row —
            # copies the complete rerun row. The flag decision is the
            # RERUN ARTIFACT'S own (ScaleProbe flags on unrounded
            # values; re-deciding here from the stored 2-dp exponent
            # could flip a near-threshold row).
            dst["queries"][q] = dict(row)
            (flagged.add if q in src_flagged else flagged.discard)(q)
            note_rows.append(q)
            continue
        changed = False
        for side in ("base", "scaled"):
            if row[side] < cur[side]:
                cur[side] = row[side]
                changed = True
        if not changed:
            continue
        ratio = cur["scaled"] / cur["base"]
        cur["ratio"] = round(ratio, 2)
        cur["exponent"] = round(math.log(ratio) / math.log(factor), 2)
        out_ratio = cur.get("out_ratio", 1.0)
        eff = ratio / max(1.0, out_ratio / factor)
        per_out_raw = math.log(max(eff, 1e-9)) / math.log(factor)
        cur["exp_per_out"] = round(per_out_raw, 2)
        row_thr = 1.5 if q.endswith("_wedge") else thr
        if per_out_raw > row_thr:
            flagged.add(q)
        else:
            flagged.discard(q)
        note_rows.append(q)
    dst["flagged"] = sorted(flagged)


def main():
    main_doc = json.load(open(MAIN))
    notes = main_doc.get("notes", [])
    for path in sys.argv[1:]:
        sub = json.load(open(path))
        touched = []
        for lvl in sub.get("levels", []):
            dst = next((x for x in main_doc["levels"]
                        if x["copies"] == lvl["copies"]), None)
            fold_level(dst, lvl, float(lvl["copies"]), touched)
        for key, factor in (("skew_level", 10.0),
                            ("skew_graph_level", None)):
            if sub.get(key, {}).get("queries"):
                dst = main_doc.get(key)
                if dst is None:
                    continue
                f = factor or float(dst.get("factor", 30))
                fold_level(dst, sub[key], f, touched)
        if touched:
            notes.append({
                "merged_from": path.split("/")[-1],
                "rows": sorted(set(touched)),
                "rule": "cross-run MIN per side (documented MIN rule); "
                        "ratio/exponent/flags recomputed"})
    main_doc["notes"] = notes
    with open(MAIN, "w") as f:
        json.dump(main_doc, f)
        f.write("\n")
    for lvl in main_doc["levels"]:
        print("copies", lvl["copies"], "flagged:", lvl.get("flagged"))
    for key in ("skew_level", "skew_graph_level"):
        if key in main_doc:
            print(key, "flagged:", main_doc[key].get("flagged"))


if __name__ == "__main__":
    main()
