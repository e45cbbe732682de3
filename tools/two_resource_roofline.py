#!/usr/bin/env python
"""Two-resource (HBM bytes + MXU flops) speed-of-light accounting, per
top-level HLO instruction, joined with a real device trace.

Why: tools/roofline.py bounds the program by min(aggregate-flops wall,
aggregate-bytes wall) — a valid bound only if ONE resource binds every
fusion. At l-scale the MGDT program is MIXED: the wide convs are
MXU-bound (per-conv AI >> the 241 ridge) while the elementwise/augment/
NMS fusions stay HBM-bound, so the true speed of light is the SUM of
per-instruction max(bytes/BW, flops/PEAK) — always >= the aggregate
bound, and the honest yardstick for "what binds the missing 35%"
(VERDICT r3 weak #3).

Method:
1. compile the serving program; parse the post-optimization HLO text into
   computations; per computation, sum conv/dot flops from shape +
   dim_labels/contracting-dims arithmetic (validated against XLA's
   aggregate cost_analysis, FMA=2 flops convention).
2. attribute flops transitively to the ENTRY instruction that calls each
   computation (fusion calls=, while body/condition, to_apply) — while
   bodies are counted ONCE (fine here: the NMS fixpoint loop is ~0 of
   program time, measured r3).
3. per ENTRY instruction: bytes = result + operand bytes (the
   tools/hbm_traffic.py traffic model: producer writes + consumer reads),
   SOL = max(bytes / 819 GB/s, flops / 197 TF/s).
4. optionally (--trace) run the program under jax.profiler and join
   per-instruction measured device time against SOL -> efficiency
   ranking: where the gap actually lives.

Usage: python tools/two_resource_roofline.py [scale] [batch] [top_n] [--trace] [--train]
  e.g. python tools/two_resource_roofline.py l 128 --trace
       python tools/two_resource_roofline.py n 32 60 --trace --train
(--train accounts the value_and_grad(loss) fwd+bwd program instead of serving)
"""
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hbm_traffic import build_infer, shape_bytes  # noqa: E402

V5E_PEAK_BF16 = 197e12
V5E_HBM_BW = 819e9

_SHAPES_RE = re.compile(r"\b(?:pred|[sub]\d+|bf16|f16|f32|f64)\[([\d,]*)\]")


def _dims(shape_text):
    m = _SHAPES_RE.search(shape_text)
    if not m:
        return []
    return [int(d) for d in m.group(1).split(",") if d]


def _split_args(arg_text):
    """Split 'bf16[1,2]{1,0} %a, bf16[3]{0} %b' at top-level commas."""
    out, depth, cur = [], 0, []
    for ch in arg_text:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _arg_dims(arg_text, shapes):
    """Dims of one operand: inline type if present, else resolved via the
    computation-local name->shape-text map (modern HLO omits operand
    types inside computation bodies: `convolution(%a, %b)`)."""
    d = _dims(arg_text)
    if d:
        return d
    m = re.search(r"%?([\w.\-]+)\s*$", arg_text.strip())
    if m and shapes is not None:
        return _dims(shapes.get(m.group(1), ""))
    return []


def _conv_flops(line, shapes=None):
    """2 * batch * out_features * kernel_in_features * prod_d(valid (output,
    tap) pairs along spatial dim d).

    Counting only in-bounds taps matches XLA's HloCostAnalysis convention and
    is ESSENTIAL here: XLA rewrites big dot_generals (the matmul-resampler,
    the TOOD decompositions) into convolutions with kernel extent ~= input
    extent and pad ~= kernel-1, where the naive out_elems*prod(kernel) formula
    overcounts ~20000x (each output position overlaps only a sliver of the
    giant kernel; the rest hits implicit zero padding)."""
    m = re.match(r"(?:ROOT )?%?[\w.\-]+ = ([^=]+?)convolution\((.*?)\)", line)
    if not m:
        return 0.0
    out_dims = _dims(m.group(1))
    args = _split_args(m.group(2))
    if len(args) < 2:
        return 0.0
    lhs = _arg_dims(args[0], shapes)
    rhs = _arg_dims(args[1], shapes)
    dl = re.search(r"dim_labels=(\w+)_(\w+)->(\w+)", line)
    if not (out_dims and lhs and rhs and dl):
        return 0.0
    lsp, rsp, osp = dl.groups()
    try:
        out_b = out_dims[osp.index("b")]
        out_f = out_dims[osp.index("f")]
        k_i = rhs[rsp.index("i")]
    except (ValueError, IndexError):
        return 0.0
    nsp = len(osp) - 2
    wm = re.search(r"window=\{([^}]*)\}", line)
    wtext = wm.group(1) if wm else ""

    def vec(key, default):
        fm = re.search(r"\b" + key + r"=([\d\-_x]+)", wtext)
        if not fm:
            return [default] * nsp
        return [int(v) for v in fm.group(1).split("x")]

    fm = re.search(r"\bpad=([\d\-_x]+)", wtext)
    pad_lo = ([int(v.split("_")[0]) for v in fm.group(1).split("x")]
              if fm else [0] * nsp)
    strides = vec("stride", 1)
    bds = vec("lhs_dilate", 1)   # base (input) dilation
    wds = vec("rhs_dilate", 1)   # window (kernel) dilation
    valid = 1.0
    for j in range(nsp):
        try:
            in_d = lhs[lsp.index(str(j))]
            out_d = out_dims[osp.index(str(j))]
            k_d = rhs[rsp.index(str(j))]
        except (ValueError, IndexError):
            return 0.0
        s = strides[j] if j < len(strides) else 1
        bd = bds[j] if j < len(bds) else 1
        wd = wds[j] if j < len(wds) else 1
        pl = pad_lo[j] if j < len(pad_lo) else 0
        ext = (in_d - 1) * bd + 1  # dilated input extent
        cnt = 0
        for o in range(out_d):
            base = o * s - pl
            for k in range(k_d):
                pos = base + k * wd
                if 0 <= pos < ext and (bd == 1 or pos % bd == 0):
                    cnt += 1
        valid *= cnt
    return 2.0 * out_b * out_f * k_i * valid


def _dot_flops(line, shapes=None):
    m = re.match(r"(?:ROOT )?%?[\w.\-]+ = ([^=]+?)dot\((.*?)\)", line)
    if not m:
        return 0.0
    out_elems = 1
    for d in _dims(m.group(1)):
        out_elems *= d
    args = _split_args(m.group(2))
    if not args:
        return 0.0
    ldims = _arg_dims(args[0], shapes)
    cm = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    if not ldims or not cm:
        return 0.0
    k = 1
    for i in (int(x) for x in cm.group(1).split(",") if x):
        if i < len(ldims):
            k *= ldims[i]
    return 2.0 * out_elems * k


_COMP_HDR = re.compile(r"^(?:ENTRY )?%?([\w.\-]+)\s*\(.*\)\s*->\s*.+\{")
# braced form captures the whole list; unbraced stops at the first non-name
# char so `calls=%f.1, metadata={...}` doesn't swallow ", metadata".
_CALL_RE = re.compile(
    r"(?:calls|to_apply|condition|body|branch_computations)="
    r"(?:\{([^}]*)\}|%?([\w.\-]+))")


def parse_hlo(hlo):
    """-> (entry_name, {comp: own_flops}, {comp: [called comps]},
    {comp: [instruction lines]})."""
    comps, calls, flops = {}, defaultdict(list), defaultdict(float)
    entry = None
    cur = None
    shapes = {}  # computation-local: instr name -> result-type text
    for raw in hlo.splitlines():
        line = raw.strip()
        hdr = _COMP_HDR.match(raw)  # headers start at column 0
        if hdr and not raw.startswith(" "):
            cur = hdr.group(1)
            comps[cur] = []
            shapes = {}
            if raw.startswith("ENTRY"):
                entry = cur
            continue
        if cur is None or not line or line == "}":
            if line == "}":
                cur = None
            continue
        comps[cur].append(line)
        dm = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\S+(?:\[[^\]]*\])?\S*)", line)
        if dm:
            shapes[dm.group(1)] = dm.group(2)
        if " convolution(" in line:
            flops[cur] += _conv_flops(line, shapes)
        elif " dot(" in line:
            flops[cur] += _dot_flops(line, shapes)
        for cm in _CALL_RE.finditer(line):
            for ref in (cm.group(1) or cm.group(2)).split(","):
                calls[cur].append(ref.strip().lstrip("%"))
    return entry, flops, calls, comps


def transitive_flops(name, flops, calls, memo):
    if name in memo:
        return memo[name]
    memo[name] = 0.0  # cycle guard
    total = flops.get(name, 0.0)
    for c in calls.get(name, ()):
        total += transitive_flops(c, flops, calls, memo)
    memo[name] = total
    return total


def entry_rows(hlo):
    """Per ENTRY instruction: (name, label, hint, bytes, flops)."""
    entry, flops, calls, comps = parse_hlo(hlo)
    memo = {}
    def_bytes = {}
    shapes = {}
    rows = []
    for line in comps[entry]:
        m = re.match(r"(?:ROOT )?(%?[\w.\-]+) = (.+)", line)
        if not m:
            continue
        name, rhs = m.groups()
        sm = re.match(r"\S+(?:\[[^\]]*\])?\S*", rhs)
        if sm:
            shapes[name.lstrip("%")] = sm.group(0)
        op_m = re.search(r"\)?\s*([a-z][\w\-]*)\(", rhs)
        opcode = op_m.group(1) if op_m else rhs.split()[0]
        res_end = rhs.index(opcode + "(") if op_m else len(rhs)
        res_b = shape_bytes(rhs[:res_end])
        def_bytes[name] = res_b
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        opnd_b = 0
        for ref in re.findall(r"%[\w.\-]+", rhs[res_end:]):
            opnd_b += def_bytes.get(ref, 0)
        f = 0.0
        if opcode == "convolution":
            f = _conv_flops(line, shapes)
        elif opcode == "dot":
            f = _dot_flops(line, shapes)
        for cm in _CALL_RE.finditer(rhs):
            for ref in (cm.group(1) or cm.group(2)).split(","):
                f += transitive_flops(ref.strip().lstrip("%"), flops, calls,
                                      memo)
        label = opcode
        fm = re.search(r'custom_call_target="([^"]+)"', rhs)
        if fm:
            label = f"cc:{fm.group(1)[:20]}"
        km = re.search(r"kind=(\w+)", rhs)
        if km and opcode == "fusion":
            label = f"fusion/{km.group(1)[1:]}"
        mm = re.search(r'op_name="([^"]+)"', rhs)
        hint = mm.group(1).split("/")[-1][:44] if mm else ""
        rows.append((name.lstrip("%"), label, hint, res_b + opnd_b, f))
    return rows


def trace_times(trace_dir, n_iters):
    """instruction name -> mean device ms per dispatch, from the newest
    profiler trace under trace_dir."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        return {}
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    agg = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        agg[e.get("name", "?")] += e.get("dur", 0) / 1e3
    return {k: v / n_iters for k, v in agg.items()}


def main(scale="l", batch=128, do_trace=False, top_n=30, train=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    if train:
        from hbm_traffic import build_train
        yaml, fn, fixed, make_batch = build_train(scale)
        args = (*fixed, make_batch(batch))
    else:
        yaml, fn, fixed, dtype = build_infer(scale)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)), dtype)
        args = (*fixed, x)
    lowered = fn.lower(*args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    rows = entry_rows(hlo)

    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    xla_flops = float(cost.get("flops", 0.0))
    ledger_flops = sum(r[4] for r in rows)
    ledger_bytes = sum(r[3] for r in rows)

    sol = {name: max(b / V5E_HBM_BW, f / V5E_PEAK_BF16)
           for name, _, _, b, f in rows}
    sol_total = sum(sol.values())
    hbm_only = ledger_bytes / V5E_HBM_BW
    mxu_only = ledger_flops / V5E_PEAK_BF16

    print(f"{yaml} scale={scale} b{batch}: ledger flops "
          f"{ledger_flops / batch / 1e9:.2f} GFLOP/img "
          f"(XLA cost_analysis {xla_flops / batch / 1e9:.2f} — parse "
          f"coverage {100 * ledger_flops / max(xla_flops, 1):.0f}%), "
          f"bytes {ledger_bytes / batch / 1e6:.1f} MB/img")
    print(f"aggregate walls: HBM {hbm_only * 1e3:.1f} ms, MXU "
          f"{mxu_only * 1e3:.1f} ms -> naive SOL "
          f"{max(hbm_only, mxu_only) * 1e3:.1f} ms "
          f"({batch / max(hbm_only, mxu_only):.0f} img/s)")
    print(f"two-resource SOL (sum of per-instr max): {sol_total * 1e3:.1f} ms"
          f" ({batch / sol_total:.0f} img/s) — "
          f"{100 * max(hbm_only, mxu_only) / sol_total:.0f}% of naive")

    times = {}
    if do_trace:
        trace_dir = "/tmp/mgdt_two_resource_trace"
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
        n_iters = 3
        jax.profiler.start_trace(trace_dir)
        for _ in range(n_iters):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
        jax.profiler.stop_trace()
        raw = trace_times(trace_dir, n_iters)
        # trace event names sometimes carry %-less HLO names verbatim
        for name, _, _, _, _ in rows:
            if name in raw:
                times[name] = raw[name]
        matched = sum(times.values())
        total = sum(v for v in raw.values())
        print(f"trace: matched {len(times)}/{len(rows)} instrs, "
              f"{matched:.1f} ms of {total:.1f} ms device time per dispatch")

    hdr = f"{'SOL ms':>7} {'bytes MB':>9} {'GFLOP':>8} {'bound':>5}"
    if times:
        hdr = f"{'meas ms':>8} {'eff%':>5} " + hdr
    print(f"\n{hdr}  instruction")
    key = (lambda r: -times.get(r[0], 0.0)) if times else (lambda r: -sol[r[0]])
    for name, label, hint, b, f in sorted(rows, key=key)[:top_n]:
        s = sol[name]
        bound = "MXU" if f / V5E_PEAK_BF16 > b / V5E_HBM_BW else "HBM"
        line = (f"{s * 1e3:7.2f} {b / 1e6:9.1f} {f / 1e9:8.1f} {bound:>5}"
                f"  {label:<24} {name[:24]:<24} {hint}")
        if times:
            t = times.get(name, float("nan"))
            eff = 100 * s * 1e3 / t if t == t and t > 0 else float("nan")
            line = f"{t:8.3f} {eff:5.0f} " + line
        print(line)

    if times:
        gap = [(times[n] - sol[n] * 1e3, n) for n in times]
        gap.sort(reverse=True)
        print("\ntop gap (measured - SOL) contributors:")
        by = {r[0]: r for r in rows}
        for g, n in gap[:12]:
            _, label, hint, b, f = by[n]
            print(f"{g:8.3f} ms  {label:<24} {n[:24]:<24} {hint}")


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if x not in ("--trace", "--train")]
    main(a[0] if a else "l", int(a[1]) if len(a) > 1 else 128,
         do_trace="--trace" in sys.argv[1:],
         top_n=int(a[2]) if len(a) > 2 else 30,
         train="--train" in sys.argv[1:])
