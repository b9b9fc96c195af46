#!/usr/bin/env python3
"""Render the COVERAGE.md 'sf1 replay' summary from a merged replay
report: python3 tools/sf1_section.py SF1_REPLAY.json"""
import json, sys

d = json.load(open(sys.argv[1]))
res = d["results"]
n_pass = d["n_pass"]
n_no = d.get("n_no_oracle", 0)
fails = {k: v for k, v in res.items()
         if not v.get("hash_match") and v.get("err") != "no_oracle"}
slow = sorted(((v.get("sec") or 0, k) for k, v in res.items()
               if v.get("hash_match")), reverse=True)[:10]
print(f"total={len(res)} pass={n_pass} no_oracle={n_no} fail={len(fails)}")
for k, v in sorted(fails.items()):
    print(f"FAIL {k}: {(v.get('err') or 'hash mismatch')[:140]}")
print("\nslowest oracle-side replays (sec):")
for s, k in slow:
    print(f"  {k}: {s}")
