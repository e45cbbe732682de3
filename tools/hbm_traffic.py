#!/usr/bin/env python
"""Rank the compiled serving program's top-level HLO instructions by HBM
traffic (operand + result bytes).

The n-scale model is HBM-bandwidth-bound (tools/roofline.py: AI 14.5 vs
ridge 241, 359 MB/img at b512), so the optimization currency is bytes, not
flops — but XLA's cost_analysis only reports the aggregate. After XLA's
fusion pass, every *top-level* instruction of the entry computation is a
unit of HBM traffic: a fusion reads its operands from HBM and writes its
result back, everything inside stays in registers/VMEM. Parsing the
post-optimization HLO text therefore gives a per-fusion byte ledger the
profiler can't (it reports time, which conflates bandwidth and latency).

Approximations: operand bytes count a buffer once per use (reuse within a
window is free in reality), and in-place/aliased buffers are counted on
both sides. Good enough to rank.

Usage: python tools/hbm_traffic.py [batch] [scale] [top_n] [--train]
(--train ledgers the value_and_grad(loss) program instead of serving)
"""
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_DT_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2,
             "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
             "f64": 8}

_SHAPE_RE = re.compile(r"\b(pred|[sub]\d+|bf16|f16|f32|f64)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum bytes over every array shape literal in `text` (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES.get(dt, 4)
    return total


def build_infer(scale):
    import jax
    import jax.numpy as jnp

    from mgdt_yolo_tpu.nn.tasks import DetectionModel, yaml_model_load
    from mgdt_yolo_tpu.ops.nms import non_max_suppression

    yaml = "mspa_c2f_gd_tood_yolov8.yaml"
    d = yaml_model_load(yaml)
    d["scale"] = scale
    mh = DetectionModel(d, dtype=jnp.bfloat16).fuse()
    variables = jax.device_put(mh.variables)

    @jax.jit
    def infer(vs, img):
        decoded, _ = mh.model.apply(vs, img, train=False)
        return non_max_suppression(decoded, conf_thres=0.25, iou_thres=0.7,
                                   max_det=300, pre_topk=1024)

    return yaml, infer, (variables,), jnp.bfloat16


def build_train(scale):
    """value_and_grad(loss) program — the fwd+bwd the trainer dispatches
    (opt/EMA excluded: ~4 ms of pure elementwise param-sized updates)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.nn.tasks import DetectionModel, yaml_model_load
    from mgdt_yolo_tpu.utils.loss import DetectionLoss

    yaml = "mspa_c2f_gd_tood_yolov8.yaml"
    d = yaml_model_load(yaml)
    d["scale"] = scale
    mh = DetectionModel(d, dtype=jnp.bfloat16)
    criterion = DetectionLoss(mh.nc, mh.reg_max, mh.stride)
    params = jax.device_put(mh.variables["params"])
    bs = jax.device_put(mh.variables.get("batch_stats", {}))
    step = jnp.int32(0)

    @jax.jit
    def fwd_bwd(params, bs, batch_d):
        def loss_fn(p):
            out, upd = mh.model.apply({"params": p, "batch_stats": bs},
                                      batch_d["img"], train=True,
                                      mutable=["batch_stats"])
            lo = criterion(out[1], batch_d, step)
            return lo.total, upd
        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads

    def make_batch(batch, imgsz=640):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((batch, imgsz, imgsz, 3),
                                     dtype=np.float32))
        max_gt = 8
        labels = jnp.asarray(rng.integers(0, 2, (batch, max_gt)), jnp.int32)
        xy = rng.random((batch, max_gt, 2), dtype=np.float32) * imgsz * 0.7
        wh = rng.random((batch, max_gt, 2), dtype=np.float32) * imgsz * 0.2 + 8
        bboxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        mask = jnp.asarray(rng.random((batch, max_gt)) < 0.7)
        return {"img": img, "gt_labels": labels, "gt_bboxes": bboxes,
                "mask_gt": mask}

    return yaml, fwd_bwd, (params, bs), make_batch


def build_augment(imgsz=640):
    """The in-graph device_augment program alone (r4: VERDICT weak #4 —
    the augment pipe costs 26.4 ms of an 88.6 ms b32 step; ledger it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mgdt_yolo_tpu.ops.device_augment import device_augment

    def make_batch(batch):
        rng = np.random.default_rng(0)
        G = 8
        return {
            "img": jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3)),
                               jnp.uint8),
            "img_hw": jnp.full((batch, 2), imgsz, jnp.float32),
            "gt_bboxes": jnp.asarray(
                rng.random((batch, G, 4), dtype=np.float32) * imgsz),
            "gt_labels": jnp.asarray(rng.integers(0, 2, (batch, G)), jnp.int32),
            "mask_gt": jnp.asarray(rng.random((batch, G)) < 0.7)}

    def aug(batch_d, key):
        return device_augment(batch_d, key, imgsz=imgsz, mosaic_p=1.0)

    key = jax.random.PRNGKey(0)
    return "device_augment", jax.jit(aug), (), lambda b: (make_batch(b), key)


def main(batch=512, scale="n", top_n=25, mode="infer"):
    import jax.numpy as jnp
    import numpy as np

    if mode == "train":
        yaml, fn, fixed, make_batch = build_train(scale)
        compiled = fn.lower(*fixed, make_batch(batch)).compile()
    elif mode == "augment":
        yaml, fn, fixed, make_args = build_augment()
        compiled = fn.lower(*make_args(batch)).compile()
    else:
        yaml, fn, fixed, dtype = build_infer(scale)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)), dtype)
        compiled = fn.lower(*fixed, x).compile()
    hlo = compiled.as_text()

    # entry computation = the one with ROOT ... after "ENTRY"
    entry = hlo[hlo.index("ENTRY"):]
    entry = entry[:entry.index("\n}")]

    # def-name -> result bytes (result shape is the text before " = ")
    def_bytes = {}
    rows = []  # (bytes, name, op_kind)
    for line in entry.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?(%?[\w.\-]+) = (.+)", line)
        if not m:
            continue
        name, rhs = m.groups()
        # result shape(s): everything before the opcode — take the shape
        # literals up to the first opcode token (a word followed by '(').
        op_m = re.search(r"\)?\s*([a-z][\w\-]*)\(", rhs)
        opcode = op_m.group(1) if op_m else rhs.split()[0]
        res_end = rhs.index(opcode + "(") if op_m else len(rhs)
        res_b = shape_bytes(rhs[:res_end])
        def_bytes[name] = res_b
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        # operand bytes: sum result bytes of referenced defs
        opnd_b = 0
        for ref in re.findall(r"%[\w.\-]+", rhs[res_end:]):
            opnd_b += def_bytes.get(ref, 0)
        label = opcode
        fm = re.search(r'custom_call_target="([^"]+)"', rhs)
        if fm:
            label = f"custom-call:{fm.group(1)}"
        km = re.search(r"kind=(\w+)", rhs)
        if km and opcode == "fusion":
            label = f"fusion/{km.group(1)[1:]}"
        # annotate with the metadata op_name tail if present (source hint)
        mm = re.search(r'op_name="([^"]+)"', rhs)
        hint = mm.group(1).split("/")[-1][:48] if mm else ""
        rows.append((res_b + opnd_b, name, label, hint))

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    xla_bytes = float(cost.get("bytes accessed", 0.0))
    print(f"{yaml} scale={scale} b{batch}: {len(rows)} top-level instrs, "
          f"ledger {total / batch / 1e6:.1f} MB/img "
          f"(XLA cost_analysis {xla_bytes / batch / 1e6:.1f} MB/img)")
    print(f"{'MB/img':>8}  {'%':>5}  instruction")
    for b, name, label, hint in rows[:int(top_n)]:
        print(f"{b / batch / 1e6:8.2f}  {100 * b / total:5.1f}  "
              f"{label:<28} {name[:28]:<28} {hint}")
    # aggregate by label
    agg = defaultdict(float)
    for b, _, label, _ in rows:
        agg[label] += b
    print("\nby op kind:")
    for label, b in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{b / batch / 1e6:8.2f}  {100 * b / total:5.1f}  {label}")


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if not x.startswith("--")]
    mode = ("train" if "--train" in sys.argv[1:]
            else "augment" if "--augment" in sys.argv[1:] else "infer")
    main(int(a[0]) if a else (32 if mode != "infer" else 512),
         a[1] if len(a) > 1 else "n",
         int(a[2]) if len(a) > 2 else 25, mode=mode)
