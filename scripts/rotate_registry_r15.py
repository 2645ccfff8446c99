"""Compute the round-15 registry rotation (prefix + overflow queue).

Same staleness policy the tripwire test mechanizes: staleness counted in
LANDED CORRECTNESS files, prefix = stalest 50 (ties by current queue
order), tail ordered stalest-first. Emits the two python lists to paste
into registry.py.
"""

import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_processing_over_streaming_data_using_flink_spark import registry

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
last_green = {}
landed = []
for path in files:
    rnd = int(re.search(r"_r0*(\d+)", os.path.basename(path)).group(1))
    landed.append(rnd)
    with open(path) as fh:
        for name, row in json.load(fh).items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)

registry._load()
names = registry._ordered_names()
NEVER = 10**6


def staleness(q):
    if q not in last_green:
        return NEVER
    return 1 + sum(1 for r in landed if r > last_green[q])


bound = math.ceil(len(names) / 50) + 1
hist = {}
for n in names:
    hist[staleness(n)] = hist.get(staleness(n), 0) + 1
print(f"# landed files: {landed}")
print(f"# N={len(names)} bound={bound} histogram={dict(sorted(hist.items()))}")

# Stable sort by -staleness keeps current queue order within a cohort.
ordered = sorted(names, key=lambda n: -staleness(n))
prefix, tail = ordered[:50], ordered[50:]
print(f"# prefix staleness: {sorted({staleness(n) for n in prefix})}")

print("_PRIORITY_FIRST = [")
for n in prefix:
    print(f'    "{n}",  # stale {staleness(n)} (last green r{last_green.get(n, 0)})')
print("]")
print("_PUSH_LAST = [")
for n in tail:
    print(f'    "{n}",')
print("]")
