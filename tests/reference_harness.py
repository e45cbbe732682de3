"""Load the reference torch model for parity testing, stubbing its CUDA deps.

The reference (/root/reference) imports mmcv / mmengine / timm at module level
(nn/modules/block.py:16-17, head.py:13-14, convnextv2.py:11). None are
installed; the pieces actually used are small, so we install minimal pure-torch
stand-ins into sys.modules before importing the reference package. The
ModulatedDeformConv2d stub is a correct pure-torch DCNv2 (bilinear sampling
per tap x mask, mmcv channel conventions) so TOODHead golden outputs are real.

Test-only helper; the framework itself never imports torch.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = Path("/root/reference")


class _ModulatedDeformConv2d(nn.Module):
    """Pure-torch DCNv2 with mmcv semantics (offset = y/x interleaved per tap)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, deform_groups=1, bias=True):
        super().__init__()
        k = kernel_size if isinstance(kernel_size, tuple) else (kernel_size, kernel_size)
        self.kernel_size = k
        self.stride = stride if isinstance(stride, tuple) else (stride, stride)
        self.padding = padding if isinstance(padding, tuple) else (padding, padding)
        self.dilation = dilation if isinstance(dilation, tuple) else (dilation, dilation)
        self.weight = nn.Parameter(torch.empty(out_channels, in_channels // groups, *k))
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)

    def forward(self, x, offset, mask):
        B, C, H, W = x.shape
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph, pw = self.padding
        dh, dw = self.dilation
        Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
        Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
        device = x.device
        base_y = torch.arange(Ho, device=device) * sh - ph
        base_x = torch.arange(Wo, device=device) * sw - pw
        gy, gx = torch.meshgrid(base_y.float(), base_x.float(), indexing="ij")
        cols = []
        for k in range(kh * kw):
            i, j = divmod(k, kw)
            py = gy + i * dh + offset[:, 2 * k]        # (B, Ho, Wo)
            px = gx + j * dw + offset[:, 2 * k + 1]
            sampled = self._bilinear(x, py, px)         # (B, C, Ho, Wo)
            cols.append(sampled * mask[:, k:k + 1])
        col = torch.stack(cols, dim=2)                 # (B, C, k, Ho, Wo)
        w = self.weight.permute(1, 2, 3, 0).reshape(1, C, kh * kw, 1, 1, -1)
        out = (col.unsqueeze(-1) * w).sum(dim=(1, 2))  # (B, Ho, Wo, O)
        out = out.permute(0, 3, 1, 2)
        if self.bias is not None:
            out = out + self.bias.view(1, -1, 1, 1)
        return out

    @staticmethod
    def _bilinear(x, py, px):
        B, C, H, W = x.shape
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        vals = 0
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            yi = y0 + dy
            xi = x0 + dx
            wy = (1 - (py - y0)) if dy == 0 else (py - y0)
            wx = (1 - (px - x0)) if dx == 0 else (px - x0)
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            idx = (yi.clamp(0, H - 1) * W + xi.clamp(0, W - 1)).long()  # (B?, Ho, Wo)
            if idx.dim() == 2:
                idx = idx.unsqueeze(0).expand(B, -1, -1)
                inb = inb.unsqueeze(0).expand(B, -1, -1)
                wy = wy.unsqueeze(0).expand(B, -1, -1)
                wx = wx.unsqueeze(0).expand(B, -1, -1)
            flat = x.reshape(B, C, H * W)
            g = torch.gather(flat, 2, idx.reshape(B, 1, -1).expand(-1, C, -1))
            g = g.reshape(B, C, *idx.shape[-2:])
            vals = vals + g * (wy * wx * inb).unsqueeze(1)
        return vals


class _Scale(nn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(float(scale)))

    def forward(self, x):
        return x * self.scale


class _ConvModule(nn.Module):
    """conv (+optional GN) + ReLU, the slice of mmcv.cnn.ConvModule used."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 conv_cfg=None, norm_cfg=None, bias=True, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size, stride, padding,
                              bias=bias if isinstance(bias, bool) else True)
        self.norm = None
        if norm_cfg is not None:
            self.norm = nn.GroupNorm(norm_cfg.get("num_groups", 16), out_channels)
        self.activate = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        return self.activate(x)


def _build_norm_layer(cfg, num_features):
    if cfg.get("type") == "GN":
        return "gn", nn.GroupNorm(cfg.get("num_groups", 16), num_features)
    return "bn", nn.BatchNorm2d(num_features)


def _install_stubs():
    if "mmcv" in sys.modules:
        return
    mmcv = types.ModuleType("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    mmcv_cnn.ConvModule = _ConvModule
    mmcv_cnn.Scale = _Scale
    mmcv_cnn.build_norm_layer = _build_norm_layer
    mmcv_cnn.build_activation_layer = lambda cfg: nn.ReLU(inplace=True)
    mmcv_ops = types.ModuleType("mmcv.ops")
    mmcv_ops_mdc = types.ModuleType("mmcv.ops.modulated_deform_conv")
    mmcv_ops_mdc.ModulatedDeformConv2d = _ModulatedDeformConv2d
    mmcv_ops.modulated_deform_conv = mmcv_ops_mdc
    mmcv.cnn = mmcv_cnn
    mmcv.ops = mmcv_ops
    sys.modules.update({"mmcv": mmcv, "mmcv.cnn": mmcv_cnn, "mmcv.ops": mmcv_ops,
                        "mmcv.ops.modulated_deform_conv": mmcv_ops_mdc})

    mmengine = types.ModuleType("mmengine")
    mmengine_model = types.ModuleType("mmengine.model")

    def normal_init(module, mean=0, std=1, bias=0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.normal_(module.weight, mean, std)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    mmengine_model.normal_init = normal_init
    mmengine.model = mmengine_model
    sys.modules.update({"mmengine": mmengine, "mmengine.model": mmengine_model})

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.DropPath = DropPath
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules.update({"timm": timm, "timm.models": timm_models,
                        "timm.models.layers": timm_layers})

    if "torchvision" not in sys.modules:
        torchvision = types.ModuleType("torchvision")
        torchvision.__version__ = "0.15.2"
        tv_ops = types.ModuleType("torchvision.ops")

        def _tv_nms(boxes, scores, iou_threshold):
            order = scores.argsort(descending=True)
            keep = []
            while order.numel():
                i = order[0].item()
                keep.append(i)
                if order.numel() == 1:
                    break
                rest = order[1:]
                xx1 = torch.max(boxes[i, 0], boxes[rest, 0])
                yy1 = torch.max(boxes[i, 1], boxes[rest, 1])
                xx2 = torch.min(boxes[i, 2], boxes[rest, 2])
                yy2 = torch.min(boxes[i, 3], boxes[rest, 3])
                inter = (xx2 - xx1).clamp(0) * (yy2 - yy1).clamp(0)
                a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                iou = inter / (a[i] + a[rest] - inter + 1e-7)
                order = rest[iou <= iou_threshold]
            return torch.tensor(keep, dtype=torch.long)

        tv_ops.nms = _tv_nms
        tv_ops_boxes = types.ModuleType("torchvision.ops.boxes")
        tv_ops_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        def _batched_nms(boxes, scores, idxs, iou_threshold):
            if boxes.numel() == 0:
                return torch.empty((0,), dtype=torch.long)
            off = boxes.max() + 1
            return _tv_nms(boxes + (idxs.float() * off)[:, None], scores, iou_threshold)

        tv_ops_boxes.batched_nms = _batched_nms
        tv_ops_boxes.nms = _tv_nms
        tv_ops.boxes = tv_ops_boxes
        tv_ops.__path__ = []
        sys.modules["torchvision.ops.boxes"] = tv_ops_boxes
        torchvision.ops = tv_ops
        tv_transforms = types.ModuleType("torchvision.transforms")

        class _Identity:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        for _n in ("Compose", "ToTensor", "Normalize", "Resize", "CenterCrop",
                   "RandomResizedCrop", "RandomHorizontalFlip", "RandomVerticalFlip",
                   "ColorJitter", "ToPILImage"):
            setattr(tv_transforms, _n, _Identity)
        torchvision.transforms = tv_transforms
        tv_datasets = types.ModuleType("torchvision.datasets")

        class _ImageFolder:
            def __init__(self, *a, **k):
                self.samples = []

        tv_datasets.ImageFolder = _ImageFolder
        torchvision.datasets = tv_datasets
        tv_tf_functional = types.ModuleType("torchvision.transforms.functional")
        tv_tf_functional.resize = lambda img, size, **k: img
        tv_tf_functional.to_pil_image = lambda img, **k: img
        tv_tf_functional.to_tensor = lambda img: img
        tv_tf_functional.normalize = lambda img, *a, **k: img
        tv_tf_functional.InterpolationMode = type("InterpolationMode", (),
                                                 {"BILINEAR": "bilinear", "NEAREST": "nearest"})
        tv_transforms.functional = tv_tf_functional
        tv_transforms.__path__ = []
        torchvision.__path__ = []  # mark as package for submodule imports
        sys.modules.update({"torchvision": torchvision, "torchvision.ops": tv_ops,
                            "torchvision.transforms": tv_transforms,
                            "torchvision.transforms.functional": tv_tf_functional,
                            "torchvision.datasets": tv_datasets})

    if "pkg_resources" not in sys.modules:  # removed from py3.12 setuptools
        pkg_resources = types.ModuleType("pkg_resources")

        class _Version:
            def __init__(self, v):
                import re as _re
                self.release = tuple(int(x) for x in _re.findall(r"\d+", v)[:3]) or (0,)

            def _key(self):
                return self.release

            def __lt__(self, o): return self._key() < o._key()
            def __le__(self, o): return self._key() <= o._key()
            def __gt__(self, o): return self._key() > o._key()
            def __ge__(self, o): return self._key() >= o._key()
            def __eq__(self, o): return self._key() == o._key()

        pkg_resources.parse_version = _Version
        pkg_resources.parse_requirements = lambda f: iter(())
        sys.modules["pkg_resources"] = pkg_resources


def import_reference():
    """Import /root/reference as the `ultralytics` package with stubs installed."""
    _install_stubs()
    parent = str(REFERENCE_ROOT.parent)
    if "ultralytics" not in sys.modules:
        # the reference dir is named 'reference' but the package calls itself
        # ultralytics; alias it
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ultralytics", REFERENCE_ROOT / "__init__.py",
            submodule_search_locations=[str(REFERENCE_ROOT)])
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ultralytics"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ultralytics"]


def build_reference_model(cfg_name: str, nc=None, subdir: str = "v8"):
    """Build a reference DetectionModel from a models/<subdir> yaml, torch CPU."""
    import_reference()
    from ultralytics.nn.tasks import DetectionModel
    cfg = str(REFERENCE_ROOT / "models" / subdir / cfg_name)
    model = DetectionModel(cfg=cfg, verbose=False, nc=nc)
    model.eval()
    # reference parse_model leaks yaml activation overrides into the GLOBAL
    # Conv.default_act (tasks.py:616-620) — reset so later builds get SiLU
    from ultralytics.nn.modules.conv import Conv
    Conv.default_act = nn.SiLU()
    return model
