#!/usr/bin/env python3
"""Sum jdk.ObjectAllocationSample weights by the first stack frame —
the sampled-allocation attribution used for the round-4/5 allocation
A/Bs. Usage: jfr_alloc.py FILE.jfr [topN]
"""
import subprocess, sys, re
from collections import Counter

path = sys.argv[1]
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 25
proc = subprocess.run(
    ["jfr", "print", "--events", "jdk.ObjectAllocationSample", path],
    capture_output=True, text=True)

MULT = {"B": 1, "kB": 1e3, "MB": 1e6, "GB": 1e9}
total = 0.0
by_site = Counter()
weight = None
in_stack = False
got_frame = False
for line in proc.stdout.splitlines():
    m = re.search(r"weight = ([\d.]+) (B|kB|MB|GB)\b", line)
    if m:
        weight = float(m.group(1)) * MULT[m.group(2)]
        in_stack = False
        got_frame = False
        continue
    if "stackTrace = [" in line:
        in_stack = True
        continue
    if in_stack and not got_frame and weight is not None:
        frame = line.strip()
        if frame and frame != "]":
            by_site[frame.split(" line:")[0]] += weight
            total += weight
            got_frame = True
            weight = None
        in_stack = False

print(f"total sampled alloc: {total/1e9:.1f} GB")
for site, w in by_site.most_common(topn):
    print(f"{w/1e9:8.1f} GB  {site}")
