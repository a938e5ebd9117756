#!/usr/bin/env python
"""Aggregate device-op self-times from a jax.profiler trace.

Usage: python tools/trace_top_ops.py /tmp/tr/<variant> [-n 25] [--merge]
       python tools/trace_top_ops.py /tmp/tr/<variant> \
           --hlo /tmp/hlo_aot/<same-config>.txt --iters 3

Reads the chrome-trace json(.gz) that ``jax.profiler.trace`` writes, keeps
events on TPU/device tracks (XLA op activity), sums duration per op name
and prints the top offenders — the attribution layer between "this variant
is X ms slower" (bench_profile) and "this specific fusion is why".

``--merge`` folds XLA's numbered op suffixes (fusion.123 -> fusion) so
repeated per-layer instances aggregate into op families.

``--hlo DUMP`` joins trace op names against the instruction metadata of an
HLO dump of the SAME config (AOT dumps from tools/aot_dump_hlo.py work:
fusion naming is deterministic for a given XLA version + target, verified
round 3 against a live v5e trace) and prints a per-LAYER table of measured
device time vs the layer's roofline speed-of-light (tools/roofline.py) —
the table that separates "XLA conv efficiency at this shape" from "extra
epilogue passes".  ``--iters`` is how many timed iterations the trace
captured (bench_profile --trace records 3).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def _find_trace(root: str):
    pats = [os.path.join(root, "**", "*.trace.json.gz"),
            os.path.join(root, "**", "*.trace.json")]
    files = []
    for p in pats:
        files += glob.glob(p, recursive=True)
    if not files:
        raise SystemExit(f"no trace files under {root}")
    return sorted(files)[-1]


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data)


def device_pids(events):
    """pids whose process name looks like a TPU/device track."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if re.search(r"TPU|/device|Device", name, re.I) \
                    and "host" not in name.lower():
                pids.add(e["pid"])
    return pids


META_OP_RE = re.compile(r"%([\w.-]+) = .*?metadata={op_name=\"([^\"]*)\"")


def hlo_op_scopes(dump_path: str):
    """instruction name -> op_name metadata (first definition wins)."""
    scopes = {}
    with open(dump_path) as f:
        for ln in f:
            m = META_OP_RE.search(ln)
            if m:
                scopes.setdefault(m.group(1), m.group(2))
    return scopes


def per_layer_table(events, pids, scopes, dump_path, iters, top):
    """Join measured device-op times to layer scopes + roofline SOL."""
    import sys as _sys
    from pathlib import Path as _Path
    _sys.path.insert(0, str(_Path(__file__).resolve().parent))
    import roofline
    from hlo_entry_bytes import META_RE, entry_lines, layer_key

    # measured device time per trace op name (= HLO ENTRY instruction)
    meas = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or (pids and e.get("pid") not in pids):
            continue
        name = e.get("name", "?")
        if name in scopes:
            meas[name] += float(e.get("dur", 0.0))

    txt = _Path(dump_path).read_text()
    lines = txt.splitlines()
    symbols = roofline.build_symbols(lines)

    # computation body -> the ENTRY instruction that calls it: XLA nests
    # whole producer convs inside consumer fusions (multi-conv fusions), so
    # SOL must be attributed to the instruction the device actually runs
    caller = {}
    for ln in lines:
        cm = re.search(r"%([\w.-]+) = .*calls=%?([\w.-]+)", ln)
        if cm:
            caller[cm.group(2)] = cm.group(1)

    def owner(comp):
        """ENTRY-level instruction name owning computation ``comp``."""
        c = comp.lstrip("%")
        seen = set()
        while c in caller and c not in seen:
            seen.add(c)
            instr = caller[c]
            # is the caller instruction itself defined inside a computation
            # that is called from elsewhere?  walk up via its defining comp
            for (cc, nm) in symbols:
                if nm == "%" + instr:
                    c2 = cc.lstrip("%")
                    if c2 in caller:
                        c = c2
                        break
            else:
                return instr
            if c not in caller:
                return instr
        return c

    fl = collections.Counter()       # instr -> flops
    label = {}                       # instr -> set of layer scopes
    for comp, ln in roofline.iter_scoped(lines):
        f = roofline.conv_flops(ln, symbols, comp)
        if f is None:
            f = roofline.dot_flops(ln, symbols, comp)
        if f:
            instr = owner(comp) if comp else None
            if instr is None or instr not in meas:
                # not a traced op: the instruction in ENTRY is itself
                dm = re.match(r"\s*(?:ROOT )?%([\w.-]+) = ", ln)
                instr = owner(comp) or (dm.group(1) if dm else "?")
            fl[instr] += f
            m = META_RE.search(ln)
            if m:
                label.setdefault(instr, []).append(layer_key(m.group(1)))

    # instr -> HBM bytes it moves: output write + operand reads (each
    # materialized array is written once and read by each consumer — per-op
    # SOL must count both sides, unlike the module-level roofline where
    # each array is counted once)
    ecomp = ""
    for ln in lines:
        if ln.startswith("ENTRY "):
            m = re.match(r"ENTRY (%[\w.-]+|\w[\w.-]*)", ln)
            ecomp = m.group(1) if m else ""
            break

    def _arr_bytes(sym):
        ent = symbols.get((ecomp, "%" + sym.lstrip("%")))
        if not ent:
            return 0
        dt, dims = ent
        n = 1
        for d in dims:
            n *= d
        return n * roofline.DTYPE_BYTES.get(dt, 4)

    by = collections.Counter()
    for ln in entry_lines(txt):
        m = re.match(r"\s*(?:ROOT )?%([\w.-]+) = \(?([a-z0-9]+)\[([\d,]*)\]"
                     r"[^ ]* ([\w-]+)\(", ln)
        if not m:
            continue
        nm, dt, dims, op = m.groups()
        if op in ("get-tuple-element", "tuple", "bitcast", "constant",
                  "parameter", "copy", "copy-start", "copy-done"):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * roofline.DTYPE_BYTES.get(dt, 4)
        for operand in roofline._operands(ln, op):
            b += _arr_bytes(operand.split(" ")[-1])
        by[nm] += b
        if nm not in label:
            mm = META_RE.search(ln)
            if mm:
                label[nm] = [layer_key(mm.group(1))]

    peak_f, peak_b = 197e12, 819e9
    rows = []
    for nm in set(meas) | set(fl):
        t_meas = meas[nm] / iters / 1e3              # us/iter -> ms
        t_mxu = fl[nm] / peak_f * 1e3
        t_hbm = by[nm] / peak_b * 1e3
        sol = max(t_mxu, t_hbm)
        lab = " + ".join(dict.fromkeys(label.get(nm, [nm])))
        rows.append((t_meas, sol, t_mxu, t_hbm, lab))
    rows.sort(reverse=True)
    print(f"\nper-fusion measured vs speed-of-light (ms/iteration, "
          f"{iters} traced iters; SOL at 197 TF/s + 819 GB/s; nested "
          f"producer convs attributed to the fusion that runs them):")
    print(f"{'layer(s) in fusion':44s} {'meas':>7s} {'SOL':>7s} {'%SOL':>5s} "
          f"{'bound':>5s} {'mxu':>7s} {'hbm':>7s}")
    tot_m = tot_s = 0.0
    for t_meas, sol, t_mxu, t_hbm, lab in rows[:top]:
        tot_m += t_meas
        tot_s += sol
        eff = 100 * sol / t_meas if t_meas else float("nan")
        print(f"{lab[:44]:44s} {t_meas:7.3f} {sol:7.3f} {eff:5.0f} "
              f"{'MXU' if t_mxu >= t_hbm else 'HBM':>5s} "
              f"{t_mxu:7.3f} {t_hbm:7.3f}")
    print(f"{'TOTAL (listed)':44s} {tot_m:7.3f} {tot_s:7.3f} "
          f"{100 * tot_s / tot_m if tot_m else float('nan'):5.0f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("-n", type=int, default=25)
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--hlo", default=None,
                    help="HLO dump of the same config: print a per-layer "
                         "measured-vs-SOL table instead of top ops")
    ap.add_argument("--iters", type=int, default=3,
                    help="timed iterations captured in the trace")
    args = ap.parse_args()

    path = _find_trace(args.root)
    events = load_events(path)
    pids = device_pids(events)

    if args.hlo:
        print(path)
        per_layer_table(events, pids, hlo_op_scopes(args.hlo), args.hlo,
                        args.iters, args.n)
        return

    total = 0.0
    by_name = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or (pids and e.get("pid") not in pids):
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))     # microseconds
        if args.merge:
            name = re.sub(r"[._]\d+(?=($|\.))", "", name)
            name = re.sub(r"\d+$", "", name)
        by_name[name] += dur
        counts[name] += 1
        total += dur

    print(f"{path}\ntotal device op time: {total / 1e3:.3f} ms "
          f"(all traced iterations)")
    print(f"{'op':60s} {'ms':>9s} {'%':>6s} {'count':>6s}")
    for name, dur in by_name.most_common(args.n):
        print(f"{name[:60]:60s} {dur / 1e3:9.3f} {100 * dur / total:6.1f} "
              f"{counts[name]:6d}")


if __name__ == "__main__":
    main()
