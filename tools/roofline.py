#!/usr/bin/env python
"""Speed-of-light (roofline) accounting from an optimized v5e HLO dump.

SURVEY §5 / BASELINE north star: "speed-of-light per chip".  This walks a
TPU-optimized HLO module (live `compiled.as_text()` or an AOT dump from
tools/aot_dump_hlo.py) and computes, per layer (Flax scope from op_name
metadata) and in total:

  * MXU flops — every `convolution` / `dot` instruction anywhere in the
    module (they live inside fusion bodies), from its literal shapes:
    conv: 2 * prod(out_spatial+batch) * Cout * (Cin/groups * prod(kernel)),
    dot:  2 * M * N * K.
  * HBM bytes — ENTRY-materialized result bytes + ENTRY parameter bytes
    (instructions inside fusions never touch HBM).

  SOL time = max(flops / peak_flops, bytes / peak_bw); the ratio of the two
  says whether the layer is MXU- or HBM-bound.  With --measured-ms the tool
  prints achieved fraction-of-SOL for the whole step.

Usage:
  python tools/roofline.py /tmp/hlo_aot/resnet18_fp8_cast_convbf16.txt \
      [--measured-ms 21.6] [--peak-tf 197] [--bw-gbs 819]
"""

import argparse
import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from hlo_entry_bytes import DTYPE_BYTES, META_RE, entry_lines, layer_key  # noqa: E402

SHAPE_TOK = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
DEF_RE = re.compile(r"^\s*(?:ROOT )?(%[\w.-]+) = \(?([a-z0-9]+)\[([\d,]*)\]")


def _dims(s):
    return [int(d) for d in s.split(",") if d]


COMP_RE = re.compile(r"^(?:ENTRY )?(%[\w.-]+|\w[\w.-]*) (?:\([^)]*\) -> .* )?{")


def build_symbols(lines):
    """(computation, %name) -> (dtype, dims).  Names like %param_0 repeat in
    every fusion computation, so symbols are scoped per computation."""
    out = {}
    comp = ""
    for ln in lines:
        cm = COMP_RE.match(ln)
        if cm:
            comp = cm.group(1)
        m = DEF_RE.match(ln)
        if m:
            out[(comp, m.group(1))] = (m.group(2), _dims(m.group(3)))
    return out


def iter_scoped(lines):
    """Yield (computation, line)."""
    comp = ""
    for ln in lines:
        cm = COMP_RE.match(ln)
        if cm:
            comp = cm.group(1)
        yield comp, ln


def _operands(line, opname):
    args = line.split(opname + "(", 1)[1]
    depth, cur, names = 1, "", []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        if ch == "," and depth == 1:
            names.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        names.append(cur.strip())
    return [n.split("(")[0].strip() for n in names]


def conv_flops(line, symbols, comp):
    """2 * out_elems * contraction, robust to XLA's operand-swapped conv
    rewrites (weights-as-lhs with a spatial-sized window + huge padding):
    contraction features = rhs's 'i'-labeled dim, and the effective kernel
    per spatial dim is min(window, lhs_spatial, rhs_spatial) — the overlap
    that does real MACs regardless of orientation."""
    if " convolution(" not in line:
        return None
    m = DEF_RE.match(line)
    if not m:
        return None
    out = _dims(m.group(3))
    out_elems = 1
    for d in out:
        out_elems *= d
    ops = _operands(line, "convolution")
    dl = re.search(r"dim_labels=([\w]+)_([\w]+)->([\w]+)", line)
    if len(ops) >= 2 and (comp, ops[0]) in symbols \
            and (comp, ops[1]) in symbols and dl:
        lhs = symbols[(comp, ops[0])][1]
        rhs = symbols[(comp, ops[1])][1]
        lhs_l, rhs_l, _ = dl.groups()
        cin = rhs[rhs_l.index("i")]
        win = re.search(r"size=([\dx]+)", line)
        wdims = ([int(d) for d in win.group(1).split("x")]
                 if win else [1] * (len(lhs) - 2))
        lhs_sp = [lhs[i] for i, c in enumerate(lhs_l) if c.isdigit()]
        rhs_sp = [rhs[i] for i, c in enumerate(rhs_l) if c.isdigit()]
        k_eff = 1
        for w, ls, rs in zip(wdims, lhs_sp, rhs_sp):
            k_eff *= min(w, ls, rs)
        return 2 * out_elems * cin * k_eff
    ksz = re.search(r"size=([\dx]+)", line)
    k = 1
    if ksz:
        for d in ksz.group(1).split("x"):
            k *= int(d)
    return 2 * out_elems * k


def dot_flops(line, symbols, comp):
    if re.search(r"\bdot\(", line) is None:
        return None
    m = DEF_RE.match(line)
    if not m:
        return None
    out = _dims(m.group(3))
    out_elems = 1
    for d in out:
        out_elems *= d
    ops = _operands(line, "dot")
    cdims = re.search(r"lhs_contracting_dims={([\d,]*)}", line)
    if ops and (comp, ops[0]) in symbols and cdims:
        lhs = symbols[(comp, ops[0])][1]
        k = 1
        for ci in _dims(cdims.group(1)):
            k *= lhs[ci]
        return 2 * out_elems * k
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--peak-tf", type=float, default=197.0)
    ap.add_argument("--bw-gbs", type=float, default=819.0)
    ap.add_argument("--measured-ms", type=float, default=None)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    txt = Path(args.dump).read_text()
    lines = txt.splitlines()

    symbols = build_symbols(lines)
    flops_by_layer = collections.Counter()
    total_flops = 0
    for comp, ln in iter_scoped(lines):
        f = conv_flops(ln, symbols, comp)
        if f is None:
            f = dot_flops(ln, symbols, comp)
        if f:
            meta = META_RE.search(ln)
            flops_by_layer[layer_key(meta.group(1)) if meta else "?"] += f
            total_flops += f

    entry_bytes = 0
    bytes_by_layer = collections.Counter()
    for ln in entry_lines("\n".join(lines)):
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = \(?([a-z0-9]+)\[([\d,]*)\]"
                     r"[^ ]* (\w+)\(", ln)
        if not m:
            continue
        dt, dims, op = m.groups()
        if op in ("get-tuple-element", "tuple", "bitcast", "constant"):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * DTYPE_BYTES.get(dt, 4)
        entry_bytes += b
        meta = META_RE.search(ln)
        bytes_by_layer[layer_key(meta.group(1)) if meta else
                       ("param" if op == "parameter" else "?")] += b

    peak_f = args.peak_tf * 1e12
    peak_b = args.bw_gbs * 1e9
    t_mxu = total_flops / peak_f
    t_hbm = entry_bytes / peak_b
    sol = max(t_mxu, t_hbm)
    print(f"module: {args.dump}")
    print(f"  MXU flops : {total_flops / 1e9:10.1f} GF  -> {t_mxu * 1e3:7.3f} ms at {args.peak_tf:.0f} TF/s")
    print(f"  HBM bytes : {entry_bytes / 1e9:10.2f} GB  -> {t_hbm * 1e3:7.3f} ms at {args.bw_gbs:.0f} GB/s")
    print(f"  speed-of-light step: {sol * 1e3:.3f} ms "
          f"({'MXU' if t_mxu >= t_hbm else 'HBM'}-bound)")
    if args.measured_ms:
        print(f"  measured {args.measured_ms:.2f} ms -> "
              f"{100 * sol * 1e3 / args.measured_ms:.1f}% of SOL")

    print(f"\n  top layers by SOL time (flops vs bytes):")
    per_layer = {}
    for k in set(flops_by_layer) | set(bytes_by_layer):
        tm = flops_by_layer[k] / peak_f
        th = bytes_by_layer[k] / peak_b
        per_layer[k] = (max(tm, th), tm, th)
    for k, (t, tm, th) in sorted(per_layer.items(),
                                 key=lambda kv: -kv[1][0])[:args.top]:
        print(f"    {k:42s} {t * 1e6:8.1f} us  "
              f"[{'MXU' if tm >= th else 'HBM'}]  "
              f"mxu {tm * 1e6:7.1f} / hbm {th * 1e6:7.1f}")


if __name__ == "__main__":
    main()
