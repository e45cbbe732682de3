"""Convolution primitives as flax.linen modules, NHWC / HWIO layouts.

TPU-native re-design of the reference conv stack (nn/modules/conv.py:16-297):
same compositional semantics (Conv = conv + BN + SiLU with torch autopad
geometry, DWConv, GhostConv, Focus, RepConv, CBAM, Concat), but expressed as
functional flax modules with fp32 params and a configurable compute dtype so
XLA keeps every conv on the MXU in bfloat16.

BatchNorm uses the reference's hyperparameters (eps=1e-3, momentum=0.03 —
reference yolo/utils/torch_utils.py initialize_weights), i.e. flax momentum
0.97. Under pjit with a batch-sharded global array the batch statistics are
automatically global — no cross-replica sync code needed.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-shape padding for odd kernels (reference conv.py:16-23)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


def silu(x):
    return x * nn.sigmoid(x)


# YAML-wide default activation override (reference Conv.default_act swap in
# parse_model when the yaml carries an `activation:` key, tasks.py:616-620).
# Trace-time state: GraphModel sets it for the duration of one trace.
_DEFAULT_ACT: list = [silu]


def set_default_act(act) -> Callable:
    """Set the activation `act=True` resolves to; returns the previous one."""
    prev = _DEFAULT_ACT[0]
    _DEFAULT_ACT[0] = get_act(act) if act is not True else silu
    return prev


def get_act(act: Union[bool, str, Callable]) -> Callable:
    """Resolve an activation spec: True -> default (SiLU unless the model
    yaml overrides), False -> identity, str -> named."""
    if act is True:
        return _DEFAULT_ACT[0]
    if act is False or act is None:
        return lambda x: x
    if callable(act):
        return act
    s = str(act).lower().replace("nn.", "").replace("()", "")
    table = {"silu": silu, "relu": nn.relu, "relu6": lambda x: jnp.clip(x, 0, 6),
             "gelu": nn.gelu, "sigmoid": nn.sigmoid, "identity": lambda x: x,
             "lrelu": lambda x: nn.leaky_relu(x, 0.1),
             "leakyrelu": lambda x: nn.leaky_relu(x, 0.1),
             "leakyrelu(0.1)": lambda x: nn.leaky_relu(x, 0.1)}
    return table[s]


def torch_conv_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform fan_in init matching torch nn.Conv2d defaults.

    shape is HWIO; fan_in = kh * kw * (Cin / groups) (groups handled by caller
    passing the grouped Cin).
    """
    import jax
    fan_in = shape[0] * shape[1] * shape[2]
    # torch kaiming_uniform_(a=sqrt(5)): gain=sqrt(2/(1+5))=sqrt(1/3),
    # bound = gain*sqrt(3/fan_in) = sqrt(1/fan_in)
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class BN(nn.Module):
    """BatchNorm with reference hyperparameters."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                            dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)


class Conv(nn.Module):
    """conv2d (no bias) + BatchNorm + activation. Reference conv.py:25-44."""
    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, str, Callable] = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # rectangular kernels: C3x's cross-convs use (1, 3) / (3, 1)
        # (reference autopad handles list k, conv.py:16-22)
        kh, kw = ((self.k, self.k) if isinstance(self.k, int)
                  else tuple(self.k))
        ph = autopad(kh, self.p, self.d)
        pw = autopad(kw, self.p, self.d)
        y = nn.Conv(self.c2, (kh, kw), strides=self.s,
                    padding=[(ph, ph), (pw, pw)],
                    feature_group_count=self.g,
                    kernel_dilation=self.d, use_bias=False,
                    kernel_init=torch_conv_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        y = BN(dtype=self.dtype, name="norm")(y, train)
        return get_act(self.act)(y)


class Conv2(nn.Module):
    """RepConv-style parallel kxk + 1x1 conv sharing one BN + act
    (reference conv.py:45-63); fuse folds cv2 into the center tap."""
    c2: int
    k: int = 3
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, str, Callable] = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        y = nn.Conv(self.c2, (self.k, self.k), strides=self.s,
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.g, kernel_dilation=self.d,
                    use_bias=False, kernel_init=torch_conv_init,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        p1 = autopad(1, self.p, self.d)
        y = y + nn.Conv(self.c2, (1, 1), strides=self.s,
                        padding=[(p1, p1), (p1, p1)],
                        feature_group_count=self.g, kernel_dilation=self.d,
                        use_bias=False, kernel_init=torch_conv_init,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="cv2")(x)
        y = BN(dtype=self.dtype, name="norm")(y, train)
        return get_act(self.act)(y)


class DWConvTranspose2d(nn.Module):
    """Depthwise transposed conv, groups=gcd(c1,c2) (reference conv.py:89-94).

    One (kh, kw, c1, c2/g) kernel (the flipped/transposed image of torch's
    grouped (c1, c2/g, kh, kw) weight) applied per group via vmapped
    lax.conv_transpose — flax has no grouped ConvTranspose."""
    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax
        import jax.lax as lax
        c1 = x.shape[-1]
        g = math.gcd(c1, self.c2)
        cin_g, cout_g = c1 // g, self.c2 // g
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32,
                -math.sqrt(1.0 / (self.k * self.k * cin_g)),
                math.sqrt(1.0 / (self.k * self.k * cin_g))),
            (self.k, self.k, c1, cout_g))
        bias = self.param("bias", nn.initializers.zeros, (self.c2,))
        b, h, w, _ = x.shape
        xg = x.reshape(b, h, w, g, cin_g).transpose(3, 0, 1, 2, 4)
        kg = kernel.reshape(self.k, self.k, g, cin_g, cout_g) \
            .transpose(2, 0, 1, 3, 4)
        # torch ConvTranspose2d(padding=p) == lax.conv_transpose padded
        # k-1-p on the stride-dilated input (verified vs torch)
        pp = self.k - 1 - self.p1
        pad = [(pp, pp), (pp, pp)]

        def one(xx, kk):
            return lax.conv_transpose(
                xx.astype(self.dtype), kk.astype(self.dtype),
                (self.s, self.s), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out = jax.vmap(one)(xg, kg)  # (g, b, oh, ow, cout_g)
        out = out.transpose(1, 2, 3, 0, 4).reshape(b, out.shape[2],
                                                   out.shape[3], self.c2)
        return out + bias.astype(out.dtype)


class DWConv(nn.Module):
    """Depthwise conv: groups = gcd(c1, c2). Reference conv.py:83-88."""
    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: Union[bool, str, Callable] = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, g=g, d=self.d, act=self.act,
                    dtype=self.dtype, name="conv")(x, train)


class LightConv(nn.Module):
    """1x1 conv (linear) + depthwise kxk (reference conv.py:66-80)."""
    c2: int
    k: int = 1
    act: Union[bool, str, Callable] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return DWConv(self.c2, self.k, act=self.act, dtype=self.dtype, name="conv2")(y, train)


class RepVGGBlock(nn.Module):
    """Three-branch rep-style block: dense 3x3+BN, 1x1+BN, identity BN,
    summed then ReLU (reference nn/modules/rep_vgg_block.py:118-182; the
    GOLD-YOLO lineage block). Deploy-time fusion folds the branches into one
    3x3 conv — on TPU that is an eval-time param transform (nn/fuse.py
    style), not a module swap."""
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.k == 3
        c1 = x.shape[-1]
        dense = Conv(self.c2, 3, self.s, g=self.g, act=False,
                     dtype=self.dtype, name="rbr_dense")(x, train)
        one = Conv(self.c2, 1, self.s, p=0, g=self.g, act=False,
                   dtype=self.dtype, name="rbr_1x1")(x, train)
        y = dense + one
        if c1 == self.c2 and self.s == 1:
            y = y + BN(dtype=self.dtype, name="rbr_identity")(x, train)
        return nn.relu(y)


class MaxPool2d(nn.Module):
    """torch nn.MaxPool2d analog over NHWC (used by the v3/v5 yamls)."""
    k: int
    s: int
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        import jax.lax as lax
        neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
            else jnp.iinfo(x.dtype).min
        return lax.reduce_window(
            x, neg, lax.max, (1, self.k, self.k, 1), (1, self.s, self.s, 1),
            [(0, 0), (self.p, self.p), (self.p, self.p), (0, 0)])


class ZeroPad2d(nn.Module):
    """torch nn.ZeroPad2d analog; pad = (left, right, top, bottom)."""
    pad: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.pad
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class ConvTranspose(nn.Module):
    """Transposed conv + optional BN + activation (reference conv.py:97-115)."""
    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Union[bool, str, Callable] = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(padding=p) == flax padded k-1-p on the
        # stride-dilated input (verified numerically vs torch)
        pp = self.k - 1 - self.p
        y = nn.ConvTranspose(self.c2, (self.k, self.k), strides=(self.s, self.s),
                             padding=[(pp, pp), (pp, pp)],
                             use_bias=not self.bn, dtype=self.dtype,
                             param_dtype=jnp.float32, name="conv_transpose")(x)
        if self.bn:
            y = BN(dtype=self.dtype, name="norm")(y, train)
        return get_act(self.act)(y)


class Focus(nn.Module):
    """Space-to-channel stem: 2x2 pixel-unshuffle then conv (conv.py:118-127)."""
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Union[bool, str, Callable] = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                             x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        return Conv(self.c2, self.k, self.s, self.p, self.g, act=self.act,
                    dtype=self.dtype, name="conv")(y, train)


class GhostConv(nn.Module):
    """Ghost conv: half features cheap 5x5 depthwise (conv.py:130-142)."""
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Union[bool, str, Callable] = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act,
                 dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, None, c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class RepConv(nn.Module):
    """Train-time 3x3 + 1x1 reparam conv (reference conv.py:144-243).

    Inference fusion into a single 3x3 is an export-time transform; here both
    branches run (XLA fuses the adds).
    """
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Union[bool, str, Callable] = True
    bn_identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, self.k, self.s, g=self.g, act=False,
                 dtype=self.dtype, name="conv1")(x, train)
        y = y + Conv(self.c2, 1, self.s, p=0, g=self.g, act=False,
                     dtype=self.dtype, name="conv2")(x, train)
        if self.bn_identity and x.shape[-1] == self.c2 and self.s == 1:
            y = y + BN(dtype=self.dtype, name="norm_id")(x, train)
        return get_act(self.act)(y)


class ChannelAttention(nn.Module):
    """SE-style channel gate (conv.py:245-258)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc")(pooled)
        return x * nn.sigmoid(w)


class SpatialAttention(nn.Module):
    """Spatial gate over mean/max channel maps (conv.py:261-271)."""
    k: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stat = jnp.concatenate([x.mean(axis=-1, keepdims=True),
                                x.max(axis=-1, keepdims=True)], axis=-1)
        pad = self.k // 2
        w = nn.Conv(1, (self.k, self.k), padding=[(pad, pad), (pad, pad)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="cv1")(stat)
        return x * nn.sigmoid(w)


class CBAM(nn.Module):
    """Channel + spatial attention (conv.py:274-284)."""
    k: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ChannelAttention(dtype=self.dtype, name="channel_attention")(x, train)
        return SpatialAttention(self.k, dtype=self.dtype, name="spatial_attention")(y, train)


class Concat(nn.Module):
    """Concatenate a list of NHWC tensors on channels (conv.py:287-297;
    YAML dim arg 1 refers to torch NCHW channel axis -> -1 here)."""
    axis: int = -1

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        return jnp.concatenate(list(xs), axis=-1)


class Upsample(nn.Module):
    """nn.Upsample equivalent (nearest, integer scale)."""
    scale: int = 2
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.common import interpolate_bilinear, upsample_nearest
        if self.mode == "nearest":
            return upsample_nearest(x, self.scale)
        b, h, w, c = x.shape
        return interpolate_bilinear(x, (h * self.scale, w * self.scale))
