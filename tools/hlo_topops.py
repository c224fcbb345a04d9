#!/usr/bin/env python3
"""Parse an optimized-HLO text dump (from tools/hlo_bytes.py --dump) and
report the materialized buffers: top-level ops of each non-fusion
computation, grouped by computation, sorted by output bytes. Fusion-internal
ops don't materialize and are skipped."""
import re
import sys
from collections import defaultdict

SIZES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
         "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
         "u64": 8}


def shape_bytes(s):
    total = 0
    for m in re.finditer(r"(pred|s8|u8|bf16|f16|s16|u16|f32|s32|u32|f64|s64|u64)\[([0-9,]*)\]", s):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * SIZES[dt]
    return total


def main():
    path = sys.argv[1]
    min_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    txt = open(path).read()
    comp = None
    skip = False
    rows = defaultdict(list)
    for line in txt.splitlines():
        m = re.match(r"(?:ENTRY )?%?([\w.\-]+) \(.*-> .* \{\s*$", line)
        if m and not line.startswith(" "):
            comp = m.group(1)
            skip = comp.startswith(("fused_", "select_",
                                    "scalar_", "and.", "or.", "add.", "max.",
                                    "min."))
            continue
        if line.startswith("}"):
            comp = None
            continue
        if comp is None or skip:
            continue
        ls = line.strip()
        m2 = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\([^)]*\)|[^ ]+) (\w[\w\-]*)\(", ls)
        if not m2:
            continue
        name, shp, op = m2.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        b = shape_bytes(shp)
        if b >= min_mb * 1e6:
            hint = ""
            mh = re.search(r'calls=%?([\w.\-]+)', ls)
            if mh:
                hint = mh.group(1)[:55]
            mk = re.search(r'custom_call_target="([^"]+)"', ls)
            if mk:
                hint = "CC:" + mk.group(1)[:52]
            mm = re.search(r'metadata=\{op_name="([^"]{0,120})', ls)
            meta = mm.group(1)[-70:] if mm else ""
            rows[comp].append((b, op, name[:40], meta, hint))
    for comp, ops in sorted(rows.items(), key=lambda kv: -sum(o[0] for o in kv[1])):
        tot = sum(o[0] for o in ops)
        print(f"\n=== {comp}: {len(ops)} ops >= {min_mb}MB, total {tot/1e6:.0f}MB")
        ops.sort(reverse=True)
        for b, op, name, meta, hint in ops[:50]:
            print(f"  {b/1e6:8.1f}MB {op:10s} {name:32s} {meta}")


if __name__ == "__main__":
    main()
