"""Declarative model compiler: YAML layer lists -> a single flax module.

TPU-native re-design of reference nn/tasks.py. The reference interprets the
YAML into an nn.Sequential executed layer-by-layer in Python
(tasks.py:604-699, 65-87); here the YAML is parsed once into a tuple of
static LayerSpecs and compiled into ONE linen module whose __call__ unrolls
the graph at trace time — zero Python dispatch after jit, full XLA fusion
across layers.

Stride discovery uses jax.eval_shape on a dummy 640px input (shape-only,
no FLOPs) instead of the reference's real dummy forward (tasks.py:241-245).
"""
from __future__ import annotations

import dataclasses
import hashlib
import math
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import unfreeze

from ..utils import LOGGER, PKG_ROOT, colorstr, yaml_load
from .modules import block as B
from .modules import conv as C
from .modules import head as H


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channel count up to the nearest multiple of divisor."""
    return math.ceil(x / divisor) * divisor


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One compiled layer of the graph (static, hashable)."""
    i: int                                   # layer index
    f: Union[int, Tuple[int, ...]]           # input layer(s), -1 = previous
    n: int                                   # repeats (depth-scaled)
    name: str                                # module type name from YAML
    args: Tuple[Any, ...]                    # normalized args (c1 first where applicable)
    c2: int                                  # output channels

    @property
    def from_list(self):
        return [self.f] if isinstance(self.f, int) else list(self.f)


# Module sets sharing the conv-style channel arithmetic (reference tasks.py:637-645)
_CONV_LIKE = {"Classify", "Conv", "Conv2", "ConvTranspose", "DWConvTranspose2d",
              "nn.ConvTranspose2d", "GhostConv", "Bottleneck",
              "GhostBottleneck", "SPP", "SPPF", "DWConv", "Focus",
              "BottleneckCSP", "RepVGGBlock",
              "C1", "C2", "C2f", "MSPA_C2f", "C3", "C3x", "C3Ghost", "C3TR",
              "RepC3"}
_REPEAT_BLOCKS = {"BottleneckCSP", "C1", "C2", "C2f", "MSPA_C2f", "C3", "C3x",
                  "C3Ghost", "C3TR", "RepC3"}
_HEADS = {"Detect", "Segment", "Pose", "TOODHead"}


def parse_model(d: Dict, ch: int = 3, verbose: bool = True
                ) -> Tuple[Tuple[LayerSpec, ...], Tuple[int, ...], Dict]:
    """Interpret a model YAML dict into LayerSpecs + save list.

    Mirrors the channel arithmetic of reference parse_model (tasks.py:604-699)
    including the GOLD-YOLO special cases (tasks.py:669-684).
    """
    nc = d.get("nc")
    scales = d.get("scales")
    depth, width, max_channels = d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0), float("inf")
    if scales:
        scale = d.get("scale")
        if not scale:
            scale = tuple(scales.keys())[0]
            if verbose:
                LOGGER.warning(f"WARNING no model scale passed, assuming scale='{scale}'")
        depth, width, max_channels = scales[scale]

    chs = [ch]
    specs, save = [], []
    rows = list(d["backbone"]) + list(d["head"])
    for i, (f, n, m, args) in enumerate(rows):
        args = list(args)
        for j, a in enumerate(args):
            if isinstance(a, str):
                if a == "nc":
                    args[j] = nc
                elif a in ("True", "False", "None"):
                    args[j] = {"True": True, "False": False, "None": None}[a]
        n = n_scaled = max(round(n * depth), 1) if n > 1 else n

        if m in _CONV_LIKE:
            c1, c2 = chs[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
            if m in _REPEAT_BLOCKS:
                args.insert(2, n)
                n = 1
        elif m in ("HGStem", "HGBlock"):
            c1, cm, c2 = chs[f], args[0], args[1]
            args = [c1, cm, c2, *args[2:]]
            if m == "HGBlock":
                args.insert(4, n)
                n = 1
        elif m == "nn.Upsample":
            c2 = chs[f]
        elif m == "Concat":
            c2 = sum(chs[x] for x in f)
        elif m in _HEADS:
            args.append([chs[x] for x in f])
            if m == "Segment":
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            c2 = None  # heads terminate the graph
        elif m == "RTDETRDecoder":
            args.insert(1, [chs[x] for x in f])
            c2 = None
        elif m == "AIFI":
            c2 = chs[f]
            args = [c2, *args]
        # ---- GOLD-YOLO special cases (reference tasks.py:669-684) ----
        elif m == "SimFusion_4in":
            c2 = sum(chs[x] for x in f)
        elif m == "SimFusion_3in":
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [[chs[x] for x in f], c2]
        elif m == "IFM":
            c1 = chs[f]
            c2 = sum(args[0])
            args = [c1, *args]
        elif m == "InjectionMultiSum_Auto_pool":
            c1 = chs[f[0]]
            c2 = args[0]
            args = [c1, *args]
        else:
            c2 = chs[f]

        def _freeze(a):
            return tuple(_freeze(x) for x in a) if isinstance(a, list) else a

        # normalize relative refs other than -1 (v3/v5 heads use -2) to
        # absolute layer indices so the runtime only special-cases -1
        def _abs(j):
            return j if j == -1 else (j % i if j < 0 else j)

        f_norm = tuple(_abs(j) for j in f) if isinstance(f, list) else _abs(f)
        spec = LayerSpec(i=i, f=f_norm, n=n,
                         name=m, args=tuple(_freeze(a) for a in args), c2=c2 or 0)
        specs.append(spec)
        save.extend(x % i for x in spec.from_list if x != -1)
        if verbose:
            LOGGER.info(f"{i:>3}{str(f):>18}{n_scaled:>3}  {m:<28}{str(args):<40}")
        if i == 0:
            chs = []
        chs.append(c2 if c2 else chs[-1] if chs else ch)
    return tuple(specs), tuple(sorted(set(save))), {
        "nc": nc, "depth": depth, "width": width,
        "act": d.get("activation")}  # e.g. 'nn.ReLU()' in the v6 yaml


def build_module(spec: LayerSpec, dtype, strides: Optional[Tuple[int, ...]],
                 kpt_shape=(17, 3), name: Optional[str] = None) -> nn.Module:
    """Instantiate the linen module for one LayerSpec."""
    a = spec.args
    name = name or f"model_{spec.i}"
    m = spec.name
    if m == "Conv":
        # full arg tuple (c2, k, s, p, g, d, act) — rtdetr input_proj uses
        # Conv [256, 1, 1, None, 1, 1, False]
        k = a[2] if len(a) > 2 else 1
        s = a[3] if len(a) > 3 else 1
        p = a[4] if len(a) > 4 else None  # v5 stem: Conv [64, 6, 2, 2]
        g = a[5] if len(a) > 5 else 1
        d = a[6] if len(a) > 6 else 1
        act = a[7] if len(a) > 7 else True
        return C.Conv(a[1], k, s, p=p, g=g, d=d, act=act, dtype=dtype,
                      name=name)
    if m == "Conv2":
        return C.Conv2(a[1], a[2] if len(a) > 2 else 3,
                       a[3] if len(a) > 3 else 1, dtype=dtype, name=name)
    if m == "DWConv":
        # (c2, k, s, d, act) — rtdetr downsamplers use DWConv [.., 1, False]
        return C.DWConv(a[1], a[2] if len(a) > 2 else 1,
                        a[3] if len(a) > 3 else 1,
                        d=a[4] if len(a) > 4 else 1,
                        act=a[5] if len(a) > 5 else True,
                        dtype=dtype, name=name)
    if m == "ConvTranspose":
        return C.ConvTranspose(a[1], *(a[2:]), dtype=dtype, name=name)
    if m == "DWConvTranspose2d":
        return C.DWConvTranspose2d(a[1], *(a[2:]), dtype=dtype, name=name)
    if m == "nn.ConvTranspose2d":  # bare deconv, no BN/act (v6 head)
        return C.ConvTranspose(a[1], a[2] if len(a) > 2 else 2,
                               a[3] if len(a) > 3 else 2,
                               a[4] if len(a) > 4 else 0,
                               bn=False, act=False, dtype=dtype, name=name)
    if m == "nn.MaxPool2d":  # args (k, s, p) — torch order (v3-tiny)
        return C.MaxPool2d(a[0], a[1] if len(a) > 1 else a[0],
                           a[2] if len(a) > 2 else 0, name=name)
    if m == "nn.ZeroPad2d":
        return C.ZeroPad2d(tuple(a[0]), name=name)
    if m == "C3TR":
        return B.C3TR(a[1], n=a[2], dtype=dtype, name=name)
    if m == "RepVGGBlock":
        return C.RepVGGBlock(a[1], a[2] if len(a) > 2 else 3,
                             a[3] if len(a) > 3 else 1, dtype=dtype, name=name)
    if m == "Focus":
        return C.Focus(a[1], a[2] if len(a) > 2 else 1, dtype=dtype, name=name)
    if m == "GhostConv":
        return C.GhostConv(a[1], *(a[2:4]), dtype=dtype, name=name)
    if m in ("C2f", "C2", "C3", "C3x", "C3Ghost", "BottleneckCSP"):
        cls = {"C2f": B.C2f, "C2": B.C2, "C3": B.C3, "C3x": B.C3x,
               "C3Ghost": B.C3Ghost, "BottleneckCSP": B.BottleneckCSP}[m]
        shortcut = a[3] if len(a) > 3 else (False if m == "C2f" else True)
        return cls(a[1], n=a[2], shortcut=shortcut, dtype=dtype, name=name)
    if m == "MSPA_C2f":
        shortcut = a[3] if len(a) > 3 else False
        return B.MSPA_C2f(a[0], a[1], n=a[2], shortcut=shortcut, dtype=dtype, name=name)
    if m == "C1":
        return B.C1(a[1], n=a[2], dtype=dtype, name=name)
    if m == "RepC3":
        return B.RepC3(a[1], n=a[2], dtype=dtype, name=name)
    if m == "Bottleneck":
        return B.Bottleneck(a[1], *(a[2:]), dtype=dtype, name=name)
    if m == "GhostBottleneck":
        return B.GhostBottleneck(a[1], *(a[2:]), dtype=dtype, name=name)
    if m == "SPPF":
        return B.SPPF(a[1], a[2] if len(a) > 2 else 5, dtype=dtype, name=name)
    if m == "SPP":
        return B.SPP(a[1], tuple(a[2]) if len(a) > 2 else (5, 9, 13), dtype=dtype, name=name)
    if m == "HGStem":
        return B.HGStem(a[1], a[2], dtype=dtype, name=name)
    if m == "HGBlock":
        return B.HGBlock(a[1], a[2], *(a[3:]), dtype=dtype, name=name)
    if m == "nn.Upsample":
        return C.Upsample(scale=int(a[1]), mode=a[2], name=name)
    if m == "Concat":
        return C.Concat(name=name)
    if m == "SimFusion_4in":
        return B.SimFusion_4in(dtype=dtype, name=name)
    if m == "SimFusion_3in":
        return B.SimFusion_3in(tuple(a[0]), a[1], dtype=dtype, name=name)
    if m == "IFM":
        return B.IFM(tuple(a[1]), dtype=dtype, name=name)
    if m == "InjectionMultiSum_Auto_pool":
        return B.InjectionMultiSum_Auto_pool(a[1], tuple(a[2]), a[3], dtype=dtype, name=name)
    if m == "Detect":
        return H.Detect(a[0], tuple(a[-1]), strides=strides, dtype=dtype, name=name)
    if m == "TOODHead":
        return H.TOODHead(a[0], a[1], tuple(a[-1]), strides=strides, dtype=dtype, name=name)
    if m == "Segment":
        return H.Segment(a[0], a[1], a[2], tuple(a[-1]), strides=strides, dtype=dtype, name=name)
    if m == "Pose":
        return H.Pose(a[0], tuple(a[1]), tuple(a[-1]), strides=strides, dtype=dtype, name=name)
    if m == "Classify":
        return H.Classify(a[1], dtype=dtype, name=name)
    if m == "RTDETRDecoder":
        from .modules.transformer import RTDETRDecoder
        extra = list(a[2:])
        kw = {}
        if extra:
            kw["hd"] = extra[0]
        return RTDETRDecoder(nc=a[0], ch=tuple(a[1]), strides=strides,
                             dtype=dtype, name=name, **kw)
    if m == "AIFI":
        from .modules.transformer import AIFI
        return AIFI(a[0], *(a[1:]), dtype=dtype, name=name)
    raise KeyError(f"unknown module type {m!r}")


def fast_init(model: nn.Module, seed, dummy: jnp.ndarray) -> Dict:
    """Materialize a variables tree from eval_shape'd structure — no forward
    trace, no XLA compile, and NO device interaction at all (the reference
    pays a real dummy forward per build, tasks.py:241-245; an earlier
    version here paid one eager `jax.random.randint` whose value-fetch
    could stall minutes behind the TPU tunnel's process grant).

    Leaves are filled by name with the same distributions the module
    initializers use: conv/dense kernels kaiming-uniform (torch default),
    norm scales 1, biases/means 0, variances 1, GRN gamma/beta 0.
    """
    abstract_key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    shapes = jax.eval_shape(lambda k, x: model.init(k, x, train=True),
                            abstract_key, dummy)
    seed = int(seed)

    def materialize(path, sds):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape, dtype = sds.shape, sds.dtype
        if name in ("kernel", "weight", "reduction_weight") and len(shape) >= 2:
            pathstr = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
            # stable digest, NOT hash(): str hashing is randomized per process
            # (PYTHONHASHSEED), which silently broke cross-process determinism
            phash = int.from_bytes(
                hashlib.sha256(pathstr.encode()).digest()[:8], "little")
            rng = np.random.default_rng((seed * 1000003 + phash) % (2 ** 63))
            if len(shape) == 4:  # HWIO conv
                fan_in = shape[0] * shape[1] * shape[2]
            else:  # dense (in, out)
                fan_in = shape[0]
            bound = math.sqrt(1.0 / fan_in)  # torch kaiming_uniform_(a=sqrt(5))
            return rng.uniform(-bound, bound, shape).astype(dtype)
        if name in ("scale", "var"):
            return np.ones(shape, dtype)
        return np.zeros(shape, dtype)  # bias, mean, gamma, beta

    return jax.tree_util.tree_map_with_path(materialize, shapes)


def _scale_img(img, ratio: float, gs: int = 32):
    """NHWC scale-and-pad to a gs-multiple canvas (reference scale_img,
    yolo/utils/torch_utils.py:261-270): bilinear resize (no antialias,
    matching F.interpolate align_corners=False) then bottom/right pad with
    0.447 (imagenet mean)."""
    if ratio == 1.0:
        return img
    b, h, w, c = img.shape
    nh, nw = int(h * ratio), int(w * ratio)
    out = jax.image.resize(img, (b, nh, nw, c), method="bilinear",
                           antialias=False)
    ph = math.ceil(h * ratio / gs) * gs
    pw = math.ceil(w * ratio / gs) * gs
    return jnp.pad(out, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)),
                   constant_values=0.447)


def _descale_pred(p, flip, scale: float, img_size):
    """Invert TTA scaling/flip on decoded preds (B, 4+nc, A) — reference
    _descale_pred, nn/tasks.py:272-281. Boxes are xywh in channels 0:4."""
    xy_wh = p[:, :4] / scale
    x, y, wh = xy_wh[:, 0:1], xy_wh[:, 1:2], xy_wh[:, 2:4]
    if flip == 2:
        y = img_size[0] - y
    elif flip == 3:
        x = img_size[1] - x
    return jnp.concatenate((x, y, wh, p[:, 4:]), axis=1)


class GraphModel(nn.Module):
    """The compiled model graph: unrolled static layer list with a save set."""
    specs: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]
    strides: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32
    act: Optional[str] = None  # yaml-wide default activation override
    # PER-MODEL DCNv2 dispatch pin ('auto'|'exact'|'windowed'), entered as a
    # trace-time scope around this graph's body so two models with different
    # pins coexist in one process (ops/deform.py semantics_scope; the
    # windowed/exact kernels are NOT interchangeable on trained weights —
    # measured -0.07..-0.26 mAP50-95, README results table)
    deform_semantics: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False, head_kwargs=None):
        from ..ops.deform import semantics_scope
        from .modules.conv import set_default_act
        prev_act = set_default_act(self.act) if self.act else None
        try:
            with semantics_scope(self.deform_semantics):
                return self._run(x, train, head_kwargs)
        finally:
            if prev_act is not None:
                set_default_act(prev_act)

    def _run(self, x, train, head_kwargs):
        saved = {}
        out = x.astype(self.dtype)
        last = self.specs[-1].i
        for spec in self.specs:
            mod = build_module(spec, self.dtype, self.strides)
            if spec.f == -1:
                inp = out
            elif isinstance(spec.f, int):
                inp = saved[spec.f]
            else:
                inp = [out if j == -1 else saved[j] for j in spec.f]
            kw = head_kwargs if (head_kwargs and spec.i == last) else {}
            if spec.n > 1:  # sequential repeat (rare: only non-CSP modules)
                # n distinct module instances (distinct params), matching the
                # reference's nn.Sequential of n modules — reusing one flax
                # instance would silently share weights across repeats.
                for r in range(spec.n):
                    m_r = mod if r == 0 else build_module(
                        spec, self.dtype, self.strides,
                        name=f"model_{spec.i}_rep{r}")
                    inp = m_r(inp, train=train)
                out = inp
            else:
                out = mod(inp, train=train, **kw)
            if spec.i in self.save:
                saved[spec.i] = out
        return out


def guess_model_scale(path) -> str:
    """Extract the n/s/m/l/x scale letter from a filename like yolov8s.yaml."""
    m = re.search(r"yolov\d+([nslmx])", Path(str(path)).stem)
    return m.group(1) if m else ""


def yaml_model_load(path) -> Dict:
    """Load a model YAML, resolving scale suffix and package model zoo paths."""
    path = Path(str(path))
    unified = re.sub(r"(\d+)([nslmx])(.+)?$", r"\1\3", str(path))
    zoo = [PKG_ROOT / "models" / v
           for v in ("v8", "v5", "v3", "v6", "rt-detr")]
    candidates = [Path(unified), path] + \
        [d / Path(unified).name for d in zoo] + [d / path.name for d in zoo]
    for cand in candidates:
        if Path(cand).is_file():
            d = yaml_load(cand)
            d["scale"] = guess_model_scale(path)
            d["yaml_file"] = str(path)
            return d
    raise FileNotFoundError(f"model yaml '{path}' not found (searched {[str(c) for c in candidates]})")


class BaseModel:
    """Shared model-holder: compiled graph + params + apply helpers."""

    task = "detect"

    def info(self):
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))
        LOGGER.info(f"model: {len(self.specs)} layers, {n_params:,} parameters")
        return len(self.specs), n_params

    @property
    def params(self):
        return self.variables["params"]

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))

    def with_dtype(self, dtype):
        """Swap the compute dtype in place (mixed precision: params stay
        fp32; flax modules cast activations/kernels per call). Rebuilds only
        the graph definition — `self.variables` stays valid. The TPU analog
        of the reference's AMP autocast (reference engine/trainer.py amp
        setup via check_amp, yolo/utils/checks.py:350-397)."""
        if dtype != self.dtype:
            self.dtype = dtype
            self.model = self.model.clone(dtype=dtype)
        return self

    @property
    def deform_semantics(self) -> str:
        """This model's DCNv2 dispatch pin ('auto'|'exact'|'windowed')."""
        return getattr(self.model, "deform_semantics", "auto")

    def set_deform_semantics(self, sem: str):
        """Pin THIS model's DCNv2 dispatch — training and eval both.

        Per-model, not process-global: the pin is a field of the flax graph
        (GraphModel.deform_semantics), entered as a trace-time scope around
        the graph body, so a windowed-trained and an exact-pinned model can
        serve side by side in one process (Ensemble, benchmark sweeps).
        Set from checkpoint sidecar metadata at load (engine/model.py), from
        export metadata at AutoBackend reload, and by resume (trainer). The
        windowed and exact kernels are NOT interchangeable on trained
        weights (measured -0.07..-0.26 mAP50-95; reference semantics are
        unbounded mmcv DCNv2, /root/reference/nn/modules/block.py:17).
        """
        from ..ops.deform import check_semantics
        if check_semantics(sem) != self.deform_semantics:
            LOGGER.info(f"deform-conv semantics pinned to {sem!r} "
                        f"for this model")
            self.model = self.model.clone(deform_semantics=sem)
        return self


class DetectionModel(BaseModel):
    """YAML-defined detection model (reference nn/tasks.py:222-294).

    Build: parse YAML -> eval_shape stride discovery at 640px -> final graph
    with static strides -> param init -> detect-head bias init.
    """

    task = "detect"

    def __init__(self, cfg="yolov8n.yaml", ch: int = 3, nc: Optional[int] = None,
                 verbose: bool = False, dtype=jnp.float32, seed: int = 0):
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc and nc != self.yaml.get("nc"):
            LOGGER.info(f"overriding nc={self.yaml.get('nc')} with nc={nc}")
            self.yaml["nc"] = nc
        self.specs, self.save, meta = parse_model(self.yaml, ch, verbose=verbose)
        self.nc = meta["nc"]
        self.act = meta.get("act")
        self.dtype = dtype
        head = self.specs[-1]
        self.head_name = head.name
        self.reg_max = 16 if head.name == "TOODHead" else 4  # fork quirk (head.py:145,481)
        self.no = self.nc + 4 * self.reg_max

        key = jax.ShapeDtypeStruct((2,), jnp.uint32)  # abstract: host-only init
        if self.head_name == "RTDETRDecoder":
            self.stride = (32,)  # reference default for non-Detect heads (tasks.py:248)
        else:
            # stride discovery: shape-only trace of a 640px dummy forward
            probe = GraphModel(self.specs, self.save, strides=None, dtype=dtype,
                               act=self.act)
            dummy = jax.ShapeDtypeStruct((1, 640, 640, ch), dtype)
            out_shape = jax.eval_shape(
                lambda k, x: probe.init_with_output(k, x, train=True), key, dummy)[0]
            feats = self._head_feats(out_shape)
            self.stride = tuple(int(640 / f.shape[1]) for f in feats)

        self.model = GraphModel(self.specs, self.save, strides=self.stride,
                                 dtype=dtype, act=self.act)
        self.variables = unfreeze(jax.device_get(
            fast_init(self.model, seed,
                      jax.ShapeDtypeStruct((1, 64, 64, ch), dtype))))
        self._bias_init()
        self.names = {i: f"{i}" for i in range(self.nc)}

    def _head_feats(self, out):
        """Pull the per-scale raw map list out of a head output structure."""
        if isinstance(out, tuple) and len(out) == 2:
            second = out[1]
            if isinstance(second, (list, tuple)) and len(second) and hasattr(second[0], "shape") \
                    and not isinstance(second[0], (list, tuple)):
                return list(second)
            if isinstance(second, tuple):  # Segment/Pose nested
                return list(second[0])
        return [out]

    def _bias_init(self):
        """Detect/TOOD prior bias init (reference head.py:179-186, 560-568)."""
        head_key = f"model_{self.specs[-1].i}"
        p = self.variables["params"].get(head_key)
        if p is None:
            return
        if self.head_name == "TOODHead":
            # reference quirk: stride hardcoded to 16 regardless of actual stride
            p["cv2"]["bias"] = np.ones_like(p["cv2"]["bias"])
            p["cv3"]["bias"] = np.full_like(p["cv3"]["bias"],
                                            math.log(5 / self.nc / (640 / 16) ** 2))
        elif self.head_name in ("Detect", "Segment", "Pose"):
            tgt = p.get("detect", p)
            for i, s in enumerate(self.stride):
                if f"cv2_{i}_2" in tgt:
                    tgt[f"cv2_{i}_2"]["bias"] = np.ones_like(tgt[f"cv2_{i}_2"]["bias"])
                    tgt[f"cv3_{i}_2"]["bias"] = np.full_like(
                        tgt[f"cv3_{i}_2"]["bias"], math.log(5 / self.nc / (640 / s) ** 2))

    def fuse(self):
        """Fold Conv+BN for deployment (reference BaseModel.fuse,
        tasks.py:121-146); eval outputs are unchanged."""
        from .fuse import fuse_conv_bn
        self.variables, _ = fuse_conv_bn(self.variables)
        return self

    # ---- forward helpers -------------------------------------------------
    def apply(self, variables, x, train: bool = False, mutable=None):
        if mutable is None:
            mutable = ["batch_stats"] if train else False
        return self.model.apply(variables, x, train=train, mutable=mutable)

    def predict(self, x, variables=None):
        """Eval forward: returns (decoded (B, 4+nc, A), feats)."""
        variables = variables or self.variables
        return self.model.apply(variables, x, train=False)

    # ---- test-time augmentation (reference _predict_augment,
    # nn/tasks.py:256-291) ------------------------------------------------
    def predict_augment(self, x, variables=None):
        """TTA inference: 3 scales [1, 0.83, 0.67], lr-flip on the middle
        scale, de-scaled and tail-clipped, concatenated along anchors.
        Every scale is a static shape, so the whole thing jits as one XLA
        program. Returns (decoded (B, 4+nc, A_total), None)."""
        variables = variables or self.variables
        img_h, img_w = x.shape[1], x.shape[2]  # NHWC
        gs = int(max(self.stride))
        ys = []
        for si, fi in zip((1.0, 0.83, 0.67), (None, 3, None)):
            xi = jnp.flip(x, axis=2) if fi == 3 else x  # 3 = lr flip (W axis)
            xi = _scale_img(xi, si, gs)
            yi, _ = self.model.apply(variables, xi, train=False)
            ys.append(_descale_pred(yi, fi, si, (img_h, img_w)))
        ys = self._clip_augmented(ys)
        return jnp.concatenate(ys, axis=-1), None

    def _clip_augmented(self, y):
        """Drop large-object anchors of the full-scale pass and small-object
        anchors of the smallest pass (reference tasks.py:282-291)."""
        nl = len(self.stride)
        g = sum(4 ** k for k in range(nl))
        i = (y[0].shape[-1] // g) * 1            # e=1 tail of the P5 grid
        y[0] = y[0][..., :-i]
        i = (y[-1].shape[-1] // g) * 4 ** (nl - 1)  # head of the P3 grid
        y[-1] = y[-1][..., i:]
        return y

    def forward_feats(self, variables, x, train: bool = True):
        """Training forward returning raw per-scale maps (+ updated BN stats)."""
        out, updates = self.model.apply(variables, x, train=train, mutable=["batch_stats"])
        return out[1], updates


class Ensemble:
    """NMS-ensemble of model holders: decoded outputs concatenated along the
    anchor axis (reference nn/tasks.py Ensemble + attempt_load_weights,
    :514-574). Quacks like a model holder for the predictor/validator."""

    def __init__(self, members):
        assert members and all(m.nc == members[0].nc for m in members), \
            f"models differ in class counts {[m.nc for m in members]}"
        self.members = members
        self.nc = members[0].nc
        self.names = members[0].names
        self.task = getattr(members[0], "task", "detect")
        self.reg_max = members[0].reg_max
        # reference: stride of the max-stride member (tasks.py:572)
        self.stride = max((m.stride for m in members), key=max)
        self.variables = {}  # members carry their own parameters
        ens = self

        class _Apply:
            @staticmethod
            def apply(variables, x, train=False, **kw):
                outs = [m.model.apply(m.variables, x, train=False)[0]
                        for m in ens.members]
                return jnp.concatenate(outs, axis=-1), None

        self.model = _Apply()

    def __len__(self):
        return len(self.members)

    def predict(self, x, variables=None):
        return self.model.apply(None, x)

    def fuse(self):
        for m in self.members:
            m.fuse()
        return self

    @property
    def deform_semantics(self) -> str:
        return self.members[0].deform_semantics

    def set_deform_semantics(self, sem: str):
        # members keep their own pins when loaded from checkpoints; this
        # forwards an explicit whole-ensemble pin
        for m in self.members:
            m.set_deform_semantics(sem)
        return self


def attempt_load_one_weight(weight, fuse: bool = False):
    """Load one model holder from a checkpoint (orbax dir / torch .pt) or an
    architecture YAML (reference attempt_load_one_weight, tasks.py:577-601)."""
    from ..engine.model import YOLO
    holder = YOLO(str(weight)).model
    if fuse:
        holder.fuse()
    return holder


def attempt_load_weights(weights, fuse: bool = False):
    """Load a single model or an NMS-ensemble from a list of checkpoints
    (reference attempt_load_weights, nn/tasks.py:537-574)."""
    ws = weights if isinstance(weights, (list, tuple)) else [weights]
    members = [attempt_load_one_weight(w, fuse=fuse) for w in ws]
    if len(members) == 1:
        return members[0]
    LOGGER.info(f"Ensemble created with {list(ws)}")
    return Ensemble(members)


class SegmentationModel(DetectionModel):
    task = "segment"


class PoseModel(DetectionModel):
    task = "pose"


class ClassificationModel(BaseModel):
    task = "classify"

    def __init__(self, cfg="yolov8n-cls.yaml", ch: int = 3, nc: Optional[int] = None,
                 verbose: bool = False, dtype=jnp.float32, seed: int = 0):
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc:
            self.yaml["nc"] = nc
        self.specs, self.save, meta = parse_model(self.yaml, ch, verbose=verbose)
        self.nc = meta["nc"]
        self.act = meta.get("act")
        self.dtype = dtype
        self.stride = (1,)
        self.model = GraphModel(self.specs, self.save, strides=None, dtype=dtype,
                                 act=self.act)
        self.variables = unfreeze(jax.device_get(
            fast_init(self.model, seed,
                      jax.ShapeDtypeStruct((1, 224, 224, ch), dtype))))
        self.names = {i: f"{i}" for i in range(self.nc)}


def guess_model_task(cfg) -> str:
    """Infer task from YAML head name (reference tasks.py:738-803)."""
    if isinstance(cfg, dict):
        head = str(cfg.get("head", [[""]])[-1][-2]).lower()
    else:
        head = str(cfg).lower()
    if "classify" in head or "-cls" in head:
        return "classify"
    if "segment" in head or "-seg" in head:
        return "segment"
    if "pose" in head or "-pose" in head:
        return "pose"
    return "detect"  # includes 'toodhead' -> detect (reference tasks.py:757)
