"""NCHW ("planar") op table — the narrow-channel execution mode.

XLA:TPU lane-pads feature-minor layouts to 128 channels; for the zoo's
narrow layers (3-48 channels at up to full 1088x1920 resolution) that is
10-40x HBM bloat and the dominant cost of the v1/v2 families (see
BASELINE.md "Conv/layout floor analysis").  In this mode a net's blobs
are carried as (B, C, H, W) planes — W on lanes, no padding waste — and:

* narrow convs run on the planar Pallas kernel (ops/conv_planar.py);
* narrow 4x4 s2 deconvs run as one planar conv producing all four output
  phases (exact, ``deconv_planar``);
* wide convs/deconvs transpose to NHWC, use the XLA conv (which is at MXU
  peak for C >= 64 at moderate resolution), and transpose back — XLA
  cancels adjacent transpose pairs between consecutive wide layers;
* everything else (PReLU, resize, concat/slice/crop, warp, pixelshuffle,
  pooling, elementwise) is implemented natively on planes.

``engine.session`` wraps whole nets in this table via ``PlanarExecutor``
(NHWC at the boundary, planes inside).  Reference semantics are identical
to ``jax_ops``; parity is pinned by tests/test_planar_ops.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import common as C
from . import jax_ops as J
from .conv_planar import (
    ACT_LEAKY,
    ACT_NONE,
    ACT_RELU,
    conv_planar,
    deconv_planar,
)

_ACT_MAP = {C.ACT_NONE: ACT_NONE, C.ACT_RELU: ACT_RELU,
            C.ACT_LEAKY: ACT_LEAKY}


def _ax(axis: int, rank: int) -> int:
    """ncnn CHW-space axis -> NCHW tensor axis."""
    if rank == 4:
        return {0: 1, 1: 2, 2: 3}[axis]
    if rank == 2:
        if axis != 0:
            raise ValueError(f"axis {axis} invalid for rank-2 blob")
        return 1
    raise ValueError(f"unsupported tensor rank {rank}")


def _planar_conv_ok(cin, cout, h, w, stride, k, dilation, pad) -> bool:
    """Use the Pallas planar conv only where it measured faster than XLA
    (tools/planar_chain.py): narrow channels (size gate is the caller's)."""
    if dilation != 1 or k != 3 or pad != 1 or stride not in (1, 2):
        return False
    if stride == 2 and (h % 2 or w % 2):
        return False
    return min(cin, cout) <= 32 and max(cin, cout) <= 64


def _planar_deconv_ok(cin, cout, k, stride, pad) -> bool:
    if (k, stride, pad) != (4, 2, 1):
        return False
    return cout <= 24 or (cout <= 32 and cin <= 48)


def _to_nhwc(x):
    return x.transpose(0, 2, 3, 1)


def _to_nchw(x):
    return x.transpose(0, 3, 1, 2)


def _op_convolution(node, inputs, w, ctx):
    _, k, dilation, stride, pad, _ = C.conv_hyperparams(node)
    x = inputs[0]
    hw = ctx["w"][node.name]["hwio"]
    bias = ctx["w"][node.name]["bias"]
    act, params = C.activation_of(node)
    cin, cout = hw.shape[2], hw.shape[3]
    big = ctx.get("planar_all") or x.shape[2] * x.shape[3] >= 400_000
    if (ctx.get("use_pallas_warp")
            and act in _ACT_MAP
            and big
            and _planar_conv_ok(cin, cout, x.shape[2], x.shape[3],
                                stride, k, dilation, pad)):
        alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
        return [conv_planar(x, hw, bias, stride=stride, pad=pad,
                            act=_ACT_MAP[act], alpha=alpha)]
    y = J.conv2d(_to_nhwc(x), hw, bias, stride=stride, pad=pad,
                 dilation=dilation)
    return [_to_nchw(J.apply_activation(y, act, params))]


def _op_deconvolution(node, inputs, w, ctx):
    _, k, _, stride, pad, _ = C.conv_hyperparams(node)
    x = inputs[0]
    hw = ctx["w"][node.name]["hwio"]
    bias = ctx["w"][node.name]["bias"]
    act, params = C.activation_of(node)
    cin, cout = hw.shape[2], hw.shape[3]
    big = ctx.get("planar_all") or x.shape[2] * x.shape[3] >= 25_000
    if (ctx.get("use_pallas_warp")
            and act in _ACT_MAP
            and big
            and _planar_deconv_ok(cin, cout, k, stride, pad)):
        alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
        return [deconv_planar(x, hw, bias, act=_ACT_MAP[act], alpha=alpha)]
    y = J.deconv2d(_to_nhwc(x), hw, bias, stride=stride, pad=pad)
    return [_to_nchw(J.apply_activation(y, act, params))]


def _op_prelu(node, inputs, w, ctx):
    x = inputs[0]
    slope = ctx["w"][node.name]["slope"].astype(x.dtype)
    slope = slope.reshape((1, -1) + (1,) * (x.ndim - 2))
    return [jnp.where(x >= 0, x, x * slope)]


def resize2d_nchw(x, out_h, out_w, method="bilinear"):
    """Half-pixel resize on planes — exact same phase-decomposed path as
    jax_ops.resize2d, on axes (2, 3)."""
    b, c, h, w = x.shape
    if (out_h, out_w) == (h, w):
        return x
    if method == "bilinear":
        y = x
        ok = True
        for axis, (src, dst) in ((2, (h, out_h)), (3, (w, out_w))):
            if dst == src:
                continue
            if dst % src == 0:
                y = J._upsample_axis(y, dst // src, axis)
            elif src % dst == 0 and (src // dst) % 2 == 0:
                y = J._downsample_axis(y, src // dst, axis)
            else:
                ok = False
                break
        if ok:
            return y
    mth = "linear" if method == "bilinear" else method
    return jax.image.resize(x, (b, c, out_h, out_w), method=mth,
                            antialias=False)


def _op_interp(node, inputs, w, ctx):
    x = inputs[0]
    rtype, oh, ow = C.interp_out_size(x.shape[2], x.shape[3], node)
    method = {1: "nearest", 2: "bilinear"}[rtype]
    return [resize2d_nchw(x, oh, ow, method)]


def _op_concat(node, inputs, w, ctx):
    axis = _ax(int(node.p(0, 0)), inputs[0].ndim)
    return [jnp.concatenate(inputs, axis=axis)]


def _op_crop(node, inputs, w, ctx):
    x = inputs[0]
    starts = node.p(-23309, [])
    ends = node.p(-23310, [])
    axes = node.p(-23311, [])
    for s, e, a in zip(starts, ends, axes):
        idx = [slice(None)] * x.ndim
        idx[_ax(int(a), x.ndim)] = slice(int(s), int(e))
        x = x[tuple(idx)]
    return [x]


def _op_slice(node, inputs, w, ctx):
    x = inputs[0]
    axis = _ax(int(node.p(1, 0)), x.ndim)
    sizes = C.slice_sizes(node, x.shape[axis], len(node.tops))
    outs = []
    offset = 0
    for s in sizes:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(offset, offset + s)
        outs.append(x[tuple(idx)])
        offset += s
    return outs


def _op_pooling(node, inputs, w, ctx):
    if int(node.p(4, 0)) != 1 or int(node.p(0, 0)) != 1:
        raise NotImplementedError("only global average pooling is used")
    return [jnp.mean(inputs[0], axis=(2, 3))]  # (B,C)


def _op_pixelshuffle(node, inputs, w, ctx):
    r = int(node.p(0, 1))
    x = inputs[0]
    b, crr, h, w_ = x.shape
    c = crr // (r * r)
    x = x.reshape(b, c, r, r, h, w_)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return [x.reshape(b, c, h * r, w_ * r)]


def _op_binaryop(node, inputs, w, ctx):
    op = int(node.p(0, 0))
    if int(node.p(1, 0)) == 1:
        b = jnp.asarray(float(node.p(2, 0.0)), dtype=inputs[0].dtype)
        return [J.binary_op(op, inputs[0], b)]
    a, b = inputs
    # ncnn (B,C) vector vs (B,C,H,W) map broadcast (v1 SE scale)
    if a.ndim == 2 and b.ndim == 4:
        a = a[:, :, None, None]
    elif a.ndim == 4 and b.ndim == 2:
        b = b[:, :, None, None]
    return [J.binary_op(op, a, b)]


def _nhwc_warp(fn):
    def op(node, inputs, w, ctx):
        image, flow = inputs[0], inputs[1]
        outs = fn(node, [_to_nhwc(image), _to_nhwc(flow)], w, ctx)
        return [_to_nchw(o) for o in outs]

    return op


OP_TABLE_PLANAR = {
    "Convolution": _op_convolution,
    "Deconvolution": _op_deconvolution,
    "InnerProduct": J._op_innerproduct,
    "PReLU": _op_prelu,
    "ReLU": J._op_relu,
    "Sigmoid": J._op_sigmoid,
    "Clip": J._op_clip,
    "Pooling": _op_pooling,
    "Interp": _op_interp,
    "Concat": _op_concat,
    "Crop": _op_crop,
    "Slice": _op_slice,
    "Split": J._op_split,
    "BinaryOp": _op_binaryop,
    "UnaryOp": J._op_unaryop,
    "Eltwise": J._op_eltwise,
    "PixelShuffle": _op_pixelshuffle,
    "rife.Warp": _nhwc_warp(J._op_warp),
    "rife.WarpDs4": _nhwc_warp(J._op_warp_ds4),
}
