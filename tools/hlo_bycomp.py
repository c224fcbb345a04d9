#!/usr/bin/env python3
"""Estimate true HBM traffic from an optimized-HLO dump: for every
instruction in an EXECUTABLE computation (entry, while bodies — not inlined
fusion bodies), sum output bytes + operand bytes. Fusion-internal ops stay
in registers/VMEM and are excluded, matching what cost_analysis()'s
"bytes accessed" measures post-fusion. Usage:

    python tools/hlo_bycomp.py /tmp/cornell.hlo [--top 40]
"""
import argparse
import re
import sys
from collections import defaultdict

from hlo_bytes import shape_bytes  # same directory


def parse_computations(path):
    """-> {comp_name: [(inst_name, shape_str, op, full_line), ...]}"""
    comps = {}
    comp = None
    for line in open(path):
        ls = line.rstrip()
        s = ls.strip()
        # computation headers start at column 0 and end with '{'
        if ls and not ls[0].isspace() and s.endswith("{") \
                and not s.startswith("HloModule"):
            name = re.match(r"(?:ENTRY )?%?([\w.\-]+)", s).group(1)
            comp = name
            comps[comp] = []
            continue
        if comp is None:
            continue
        m2 = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\([^)]*\)|[^ ]+) "
                      r"([\w\-]+)\(", s)
        if m2:
            comps[comp].append((m2.group(1), m2.group(2), m2.group(3), s))
    return comps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--min-mb", type=float, default=1.0)
    args = ap.parse_args()

    comps = parse_computations(args.dump)
    # executable = ENTRY + while bodies/conds (fusion bodies are inlined,
    # reduce/sort/scatter subcomputations are per-element)
    text = open(args.dump).read()
    called = set(re.findall(r"(?:body|condition)=%([\w.\-]+)", text))
    executable = {k: v for k, v in comps.items()
                  if k in called or k.startswith("main")
                  or k.startswith("ENTRY")}
    print("executable computations:",
          ", ".join(f"{k}({len(v)})" for k, v in executable.items()
                    if len(v) > 3))

    grand = 0
    for comp_name, insts in executable.items():
        shapes = {n: s for n, s, _, _ in insts}
        rows = []
        total = 0
        for name, shp, op, full in insts:
            if op in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast", "while", "conditional", "call"):
                continue
            out_b = shape_bytes(shp)
            # operands: names inside the call parens referencing known insts
            opnds = re.search(r"= (?:\([^)]*\)|[^ ]+) [\w\-]+\((.*)$", full)
            in_b = 0
            if opnds:
                for ref in re.findall(r"%?([\w.\-]+)", opnds.group(1)):
                    if ref in shapes:
                        in_b += shape_bytes(shapes[ref])
            b = out_b + in_b
            total += b
            hint = ""
            mh = re.search(r"calls=%?([\w.\-]+)", full)
            if mh:
                hint = mh.group(1)[:70]
            mk = re.search(r'custom_call_target="([^"]+)"', full)
            if mk:
                hint = mk.group(1)[:70]
            rows.append((b, out_b, op, name[:45], hint))
        if total < 20e6:
            continue
        grand += total
        print(f"\n=== {comp_name}: {total/1e9:.3f}GB I/O "
              f"({len(insts)} insts) ===")
        byop = defaultdict(int)
        for b, _, op, _, _ in rows:
            byop[op] += b
        print("  by op: " + ", ".join(
            f"{o}={v/1e6:.0f}MB" for o, v in
            sorted(byop.items(), key=lambda kv: -kv[1])[:10]))
        for b, ob, op, name, hint in sorted(rows, reverse=True)[:args.top]:
            if b < args.min_mb * 1e6:
                break
            print(f"  {b/1e6:9.1f}MB (out {ob/1e6:7.1f}) {op:12s} "
                  f"{name:45s} {hint}")
    print(f"\ngrand total I/O bytes (1 trip each): {grand/1e9:.3f}GB")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    sys.exit(main())
