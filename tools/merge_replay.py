#!/usr/bin/env python3
"""Merge partial oracle_replay reports (parallel chunks / per-query runs)
into one board: python3 tools/merge_replay.py OUT.json IN1.json IN2.json ...

Later inputs win on name collisions (rerun a failed query, list its
report last). Totals are recomputed from the merged rows. All inputs
must share one sf_dir — a mixed-scale merge would silently report one
chunk's provenance for the whole board, so it fails loudly instead.
"""
import json, sys


def main():
    out, ins = sys.argv[1], sys.argv[2:]
    merged, meta, sf_dirs = {}, {}, set()
    for p in ins:
        try:
            d = json.load(open(p))
        except (OSError, json.JSONDecodeError) as e:
            print(f"[merge] skip {p}: {e}")
            continue
        merged.update(d.get("results", {}))
        sf_dirs.add(d.get("sf_dir"))
        meta = {"sf_dir": d.get("sf_dir"), "out_dir": "merged"}
    if len(sf_dirs) > 1:
        sys.exit(f"[merge] refusing mixed-scale merge: sf_dirs={sorted(map(str, sf_dirs))}")
    n_pass = sum(1 for v in merged.values()
                 if v.get("rows_match") and v.get("schema_match")
                 and v.get("hash_match"))
    n_no = sum(1 for v in merged.values() if v.get("err") == "no_oracle")
    n_fail = len(merged) - n_pass - n_no
    with open(out, "w") as f:
        json.dump({**meta, "n_queries": len(merged), "n_pass": n_pass,
                   "n_fail": n_fail, "n_no_oracle": n_no,
                   "results": dict(sorted(merged.items()))}, f, indent=1)
    print(f"[merge] {len(merged)} queries: {n_pass} pass / {n_fail} fail / "
          f"{n_no} no_oracle -> {out}")
    for k, v in sorted(merged.items()):
        if not (v.get("hash_match") or v.get("err") == "no_oracle"):
            print(f"[merge]   FAIL {k}: {v.get('err')}")


if __name__ == "__main__":
    main()
