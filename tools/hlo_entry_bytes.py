#!/usr/bin/env python
"""Account HBM bytes from an optimized-HLO dump's ENTRY computation.

Instructions INSIDE fusions never touch HBM; the honest per-step traffic is
the ENTRY computation's instruction RESULTS (each materializes once) plus the
parameter reads.  Groups result bytes by the layer path in metadata op_name
(the Flax module scope survives into HLO metadata), so two dumps can be
diffed per layer boundary:

    python tools/hlo_entry_bytes.py /tmp/hlo/a.txt [/tmp/hlo/b.txt]
"""

import collections
import re
import sys

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "f8e3m4": 1, "f8e4m3": 1, "f8e5m2": 1,
               "f8e4m3fn": 1, "s16": 2, "u16": 2, "f64": 8}

SHAPE_RE = re.compile(r"^\s*(?:ROOT )?%?[\w.-]+ = \(?([a-z0-9]+)\[([\d,]*)\]")
META_RE = re.compile(r'op_name="([^"]+)"')


def entry_lines(txt):
    lines = txt.splitlines()
    i = next(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    depth, out = 0, []
    for ln in lines[i:]:
        out.append(ln)
        depth += ln.count("{") - ln.count("}")
        if depth <= 0 and len(out) > 1:
            break
    return out


def layer_key(op_name):
    """Collapse an op_name like 'jit(fn)/jit(main)/QuantizedMobileNetV2/
    block1_0/expand/act_q/...' to the module path block1_0/expand."""
    parts = [p for p in op_name.split("/")
             if not p.startswith("jit(") and p not in ("transpose[", )]
    keep = []
    for p in parts:
        if re.match(r"^(Quantized|Quant[A-Z])", p):
            continue
        keep.append(p)
        if len(keep) >= 2:
            break
    return "/".join(keep) if keep else op_name[:40]


def analyze(path):
    txt = open(path).read()
    by_layer = collections.Counter()
    by_op = collections.Counter()
    rows = []
    for ln in entry_lines(txt):
        m = SHAPE_RE.match(ln)
        if not m:
            continue
        op_m = re.search(r"= \(?[a-z0-9]+\[[\d,]*\][^ ]* (\w+)\(", ln)
        op = op_m.group(1) if op_m else "?"
        if op in ("parameter", "get-tuple-element", "tuple", "bitcast",
                  "constant"):
            continue
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = n * DTYPE_BYTES.get(dt, 4)
        meta = META_RE.search(ln)
        key = layer_key(meta.group(1)) if meta else f"<no-meta:{op}>"
        by_layer[key] += nbytes
        by_op[op] += nbytes
        rows.append((nbytes, op, f"{dt}[{dims}]", key))
    total = sum(by_layer.values())
    return total, by_layer, by_op, rows


def main():
    paths = sys.argv[1:]
    results = {p: analyze(p) for p in paths}
    for p, (total, by_layer, by_op, rows) in results.items():
        print(f"\n== {p}: ENTRY result bytes = {total/1e9:.2f} GB")
        print("   by op:", {k: round(v / 1e9, 2)
                            for k, v in by_op.most_common(8)})
        print("   top layers:")
        for k, v in by_layer.most_common(12):
            print(f"     {v/1e6:8.1f} MB  {k}")
    if len(paths) == 2:
        (t0, a, _, _), (t1, b, _, _) = results[paths[0]], results[paths[1]]
        print(f"\n== delta ({paths[1]} - {paths[0]}): "
              f"{(t1 - t0)/1e9:+.2f} GB; top layer deltas:")
        deltas = {k: b.get(k, 0) - a.get(k, 0) for k in set(a) | set(b)}
        for k, v in sorted(deltas.items(), key=lambda kv: -abs(kv[1]))[:15]:
            print(f"     {v/1e6:+9.1f} MB  {k}")


if __name__ == "__main__":
    main()
