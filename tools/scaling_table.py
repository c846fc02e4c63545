#!/usr/bin/env python3
"""Rewrite SCALING.md's bench-table numeric columns from two graft.Bench
JSON lines (sf0.01 + sf0.1), keeping each row's note column verbatim.
Usage: scaling_table.py BENCH_SF001.json BENCH_SF01.json SCALING.md
Prints queries present in the bench output but missing from the table
(and vice versa) so drift fails loudly instead of silently.
"""
import sys, json, re

b001 = json.load(open(sys.argv[1]))["queries"]
b01 = json.load(open(sys.argv[2]))["queries"]
path = sys.argv[3]
lines = open(path).read().split("\n")

row = re.compile(r"^\| (q\d+\w*) \| [\d.]+ \| [\d.]+ \| [\d.]+ \| (.*) \|$")
tot = re.compile(r"^\| \*\*total\*\* \| \*\*[\d.]+\*\* \| \*\*[\d.]+\*\* "
                 r"\| \*\*[\d.]+\*\* \| (.*) \|$")
seen = set()
out = []
for ln in lines:
    m = row.match(ln)
    if m:
        q, note = m.group(1), m.group(2)
        if q not in b001 or q not in b01:
            print(f"TABLE ROW NOT IN BENCH OUTPUT: {q}")
            out.append(ln)
            continue
        seen.add(q)
        a, b = b001[q], b01[q]
        out.append(f"| {q} | {a:.2f} | {b:.2f} | {b / a:.1f} | {note} |")
        continue
    m = tot.match(ln)
    if m:
        ta, tb = sum(b001.values()), sum(b01.values())
        out.append(f"| **total** | **{ta:.1f}** | **{tb:.1f}** | "
                   f"**{tb / ta:.1f}** | {m.group(1)} |")
        continue
    out.append(ln)

for q in sorted(set(b001) - seen):
    print(f"BENCH QUERY NOT IN TABLE: {q}")
open(path, "w").write("\n".join(out))
print(f"rewrote {len(seen)} rows + total")
