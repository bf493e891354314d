#!/usr/bin/env python3
"""Extend the living min-of-history bench composite with this round's
quiet full-surface runs.

Usage: update_composite.py <prior_composite.json> <new_composite.json>
         <fullsurface_raw.jsonl> [--redesigned q1,q2,...]

Per the round-7 convention, queries listed in --redesigned take this
round's min as a FRESH row (post-redesign minimum) instead of folding
into history; new queries are appended; everything else keeps
min(prior, this round). The prior composite file is left untouched
(frozen provenance).
"""
import json, re, sys

prior_path, new_path, raw_path = sys.argv[1], sys.argv[2], sys.argv[3]
redesigned = set()
if len(sys.argv) > 5 and sys.argv[4] == "--redesigned":
    redesigned = set(sys.argv[5].split(","))

prior = json.load(open(prior_path))
rounds = []
for line in open(raw_path):
    m = re.search(r"(\{\"metric\".*\})\s*$", line)
    if m:
        rounds.append(json.loads(m.group(1)))
assert rounds, "no bench lines found"

new_min = {}
for r in rounds:
    assert not r.get("errors"), f"bench errors: {r['errors']}"
    for q, v in r["queries"].items():
        new_min[q] = min(new_min.get(q, 1e18), v)

out = dict(prior)
qs = dict(prior["queries"])
for q, v in new_min.items():
    if q in redesigned or q not in qs:
        qs[q] = v
    else:
        qs[q] = min(qs[q], v)
out["queries"] = qs
out["value"] = sum(qs.values())
out["sf"] = rounds[0].get("sf", prior.get("sf"))
json.dump(out, open(new_path, "w"), separators=(",", ":"))
print(f"rows={len(qs)} total={out['value']:.1f}s "
      f"(prior {len(prior['queries'])} rows {prior['value']:.1f}s)")
