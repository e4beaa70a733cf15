"""NumPy oracle backend — slow, obviously-correct reference implementations.

This is the test-side "fake backend" (SURVEY.md §4): every JAX op and every
full-graph execution is checked against these on tiny shapes.  Keep this file
boring and literal; no cleverness, no vectorisation tricks that could share a
bug with the JAX path.
"""

from __future__ import annotations


import numpy as np

from ..graph.weights import LayerWeights
from . import common as C


def conv2d(x, w_oihw, bias, *, stride=1, pad=0, dilation=1):
    b, h, w, cin = x.shape
    co, ci, kh, kw = w_oihw.shape
    assert ci == cin
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - dilation * (kh - 1) - 1) // stride + 1
    ow = (w + 2 * pad - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((b, oh, ow, co), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = xp[
                :,
                i * dilation : i * dilation + (oh - 1) * stride + 1 : stride,
                j * dilation : j * dilation + (ow - 1) * stride + 1 : stride,
                :,
            ]
            out += patch.astype(np.float64) @ w_oihw[:, :, i, j].T.astype(np.float64)
    if bias is not None:
        out += bias
    return out.astype(np.float32)


def deconv2d(x, w_iohw, bias, *, stride=2, pad=1):
    """torch ConvTranspose2d semantics; weight (in, out, kh, kw)."""
    b, h, w, cin = x.shape
    ci, co, kh, kw = w_iohw.shape
    assert ci == cin
    oh = (h - 1) * stride - 2 * pad + kh
    ow = (w - 1) * stride - 2 * pad + kw
    full = np.zeros((b, oh + 2 * pad, ow + 2 * pad, co), dtype=np.float64)
    proj = np.einsum("bhwi,iokl->bhwokl", x.astype(np.float64), w_iohw.astype(np.float64))
    for i in range(kh):
        for j in range(kw):
            full[:, i : i + (h - 1) * stride + 1 : stride,
                 j : j + (w - 1) * stride + 1 : stride, :] += proj[:, :, :, :, i, j]
    out = full[:, pad : pad + oh, pad : pad + ow, :]
    if bias is not None:
        out = out + bias
    return out.astype(np.float32)


def resize_bilinear(x, oh, ow):
    """Half-pixel 2-tap bilinear (align_corners=False, no anti-aliasing)."""
    b, h, w, c = x.shape
    if (oh, ow) == (h, w):
        return x

    def axis_weights(n_in, n_out):
        coords = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        i0 = np.floor(coords).astype(int)
        frac = coords - i0
        i0c = np.clip(i0, 0, n_in - 1)
        i1c = np.clip(i0 + 1, 0, n_in - 1)
        return i0c, i1c, frac.astype(np.float64)

    y0, y1, fy = axis_weights(h, oh)
    x0, x1, fx = axis_weights(w, ow)
    xf = x.astype(np.float64)
    rows = xf[:, y0] * (1 - fy)[None, :, None, None] + xf[:, y1] * fy[None, :, None, None]
    out = (
        rows[:, :, x0] * (1 - fx)[None, None, :, None]
        + rows[:, :, x1] * fx[None, None, :, None]
    )
    return out.astype(np.float32)


def resize_nearest(x, oh, ow):
    b, h, w, c = x.shape
    ys = np.minimum((np.arange(oh) * h // oh), h - 1)
    xs = np.minimum((np.arange(ow) * w // ow), w - 1)
    return x[:, ys][:, :, xs]


def warp(image, flow):
    """Literal transcription of /root/reference/src/warp.comp:42-63."""
    b, h, w, c = image.shape
    out = np.zeros_like(image, dtype=np.float32)
    for bi in range(b):
        for gy in range(h):
            for gx in range(w):
                sx = gx + float(flow[bi, gy, gx, 0])
                sy = gy + float(flow[bi, gy, gx, 1])
                x0 = int(np.floor(sx))
                y0 = int(np.floor(sy))
                x1 = x0 + 1
                y1 = y0 + 1
                x0c = min(max(x0, 0), w - 1)
                y0c = min(max(y0, 0), h - 1)
                x1c = min(max(x1, 0), w - 1)
                y1c = min(max(y1, 0), h - 1)
                alpha = sx - x0c
                beta = sy - y0c
                v0 = image[bi, y0c, x0c]
                v1 = image[bi, y0c, x1c]
                v2 = image[bi, y1c, x0c]
                v3 = image[bi, y1c, x1c]
                v4 = v0 * (1 - alpha) + v1 * alpha
                v5 = v2 * (1 - alpha) + v3 * alpha
                out[bi, gy, gx] = v4 * (1 - beta) + v5 * beta
    return out


def pixel_shuffle(x, r):
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def apply_activation(x, act, params):
    if act == C.ACT_NONE:
        return x
    if act == C.ACT_RELU:
        return np.maximum(x, 0)
    if act == C.ACT_LEAKY:
        return np.where(x >= 0, x, x * np.float32(params[0]))
    if act == C.ACT_CLIP:
        return np.clip(x, params[0], params[1])
    if act == C.ACT_SIGMOID:
        xc = np.clip(x.astype(np.float64), -80.0, 80.0)
        return (1.0 / (1.0 + np.exp(-xc))).astype(np.float32)
    raise NotImplementedError(f"activation {act}")


def _broadcast_pair(a, b):
    if a.ndim == b.ndim:
        return a, b
    if a.ndim == 2 and b.ndim == 4:
        return a[:, None, None, :], b
    if a.ndim == 4 and b.ndim == 2:
        return a, b[:, None, None, :]
    raise ValueError


def binary_op(op, a, b):
    if hasattr(b, "ndim") and b.ndim > 0:
        a, b = _broadcast_pair(a, b)
    table = {
        C.BINARY_ADD: lambda: a + b,
        C.BINARY_SUB: lambda: a - b,
        C.BINARY_MUL: lambda: a * b,
        C.BINARY_DIV: lambda: a / b,
        C.BINARY_MAX: lambda: np.maximum(a, b),
        C.BINARY_MIN: lambda: np.minimum(a, b),
        C.BINARY_POW: lambda: np.power(a, b),
        C.BINARY_RSUB: lambda: b - a,
        C.BINARY_RDIV: lambda: b / a,
    }
    return table[op]()


_UNARY = {
    C.UNARY_ABS: np.abs,
    C.UNARY_NEG: np.negative,
    C.UNARY_FLOOR: np.floor,
    C.UNARY_CEIL: np.ceil,
    C.UNARY_SQUARE: np.square,
    C.UNARY_SQRT: np.sqrt,
    C.UNARY_RSQRT: lambda x: 1.0 / np.sqrt(x),
    C.UNARY_EXP: np.exp,
    C.UNARY_LOG: np.log,
    C.UNARY_SIN: np.sin,
    C.UNARY_COS: np.cos,
    C.UNARY_TAN: np.tan,
}


# --- layer table -----------------------------------------------------------

def _op_convolution(node, inputs, w: LayerWeights, ctx):
    _, k, dilation, stride, pad, _ = C.conv_hyperparams(node)
    y = conv2d(inputs[0], w.weight, w.bias, stride=stride, pad=pad, dilation=dilation)
    act, params = C.activation_of(node)
    return [apply_activation(y, act, params)]


def _op_deconvolution(node, inputs, w, ctx):
    _, k, _, stride, pad, _ = C.conv_hyperparams(node)
    y = deconv2d(inputs[0], w.weight, w.bias, stride=stride, pad=pad)
    act, params = C.activation_of(node)
    return [apply_activation(y, act, params)]


def _op_innerproduct(node, inputs, w, ctx):
    y = inputs[0].astype(np.float64) @ w.weight.T.astype(np.float64)
    if w.bias is not None:
        y = y + w.bias
    act, params = C.activation_of(node)
    return [apply_activation(y.astype(np.float32), act, params)]


def _op_prelu(node, inputs, w, ctx):
    x = inputs[0]
    return [np.where(x >= 0, x, x * w.slope.astype(np.float32))]


def _op_relu(node, inputs, w, ctx):
    x = inputs[0]
    slope = float(node.p(0, 0.0))
    return [np.where(x >= 0, x, x * np.float32(slope))]


def _op_pooling(node, inputs, w, ctx):
    if int(node.p(4, 0)) != 1 or int(node.p(0, 0)) != 1:
        raise NotImplementedError
    return [inputs[0].mean(axis=(1, 2), dtype=np.float64).astype(np.float32)]


def _op_interp(node, inputs, w, ctx):
    x = inputs[0]
    rtype, oh, ow = C.interp_out_size(x.shape[1], x.shape[2], node)
    fn = {1: resize_nearest, 2: resize_bilinear}[rtype]
    return [fn(x, oh, ow)]


def _op_concat(node, inputs, w, ctx):
    axis = C.chw_axis_to_nhwc(int(node.p(0, 0)), inputs[0].ndim)
    return [np.concatenate(inputs, axis=axis)]


def _op_crop(node, inputs, w, ctx):
    x = inputs[0]
    for axis, start, end in C.crop_slices(node, x.ndim):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, end)
        x = x[tuple(idx)]
    return [x]


def _op_slice(node, inputs, w, ctx):
    x = inputs[0]
    axis = C.chw_axis_to_nhwc(int(node.p(1, 0)), x.ndim)
    sizes = C.slice_sizes(node, x.shape[axis], len(node.tops))
    outs, offset = [], 0
    for s in sizes:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(offset, offset + s)
        outs.append(x[tuple(idx)])
        offset += s
    return outs


def _op_binaryop(node, inputs, w, ctx):
    op = int(node.p(0, 0))
    if int(node.p(1, 0)) == 1:
        return [binary_op(op, inputs[0], np.float32(node.p(2, 0.0)))]
    return [binary_op(op, inputs[0], inputs[1])]


def _op_eltwise(node, inputs, w, ctx):
    if int(node.p(0, 0)) != 1:
        raise NotImplementedError
    coeffs = C.eltwise_coeffs(node, len(inputs))
    acc = np.zeros_like(inputs[0], dtype=np.float64)
    for x, cf in zip(inputs, coeffs):
        acc += x.astype(np.float64) * cf
    return [acc.astype(np.float32)]


OP_TABLE = {
    "Convolution": _op_convolution,
    "Deconvolution": _op_deconvolution,
    "InnerProduct": _op_innerproduct,
    "PReLU": _op_prelu,
    "ReLU": _op_relu,
    "Sigmoid": lambda n, i, w, c: [apply_activation(i[0], C.ACT_SIGMOID, [])],
    "Clip": lambda n, i, w, c: [np.clip(i[0], float(n.p(0)), float(n.p(1)))],
    "Pooling": _op_pooling,
    "Interp": _op_interp,
    "Concat": _op_concat,
    "Crop": _op_crop,
    "Slice": _op_slice,
    "Split": lambda n, i, w, c: [i[0]] * len(n.tops),
    "BinaryOp": _op_binaryop,
    "UnaryOp": lambda n, i, w, c: [_UNARY[int(n.p(0, 0))](i[0])],
    "Eltwise": _op_eltwise,
    "PixelShuffle": lambda n, i, w, c: [pixel_shuffle(i[0], int(n.p(0, 1)))],
    "rife.Warp": lambda n, i, w, c: [warp(i[0], i[1])],
    # fused Interp(1/4) ∘ Warp (graph/rewrite.py); the oracle keeps the
    # unfused form — exactness of the fusion is a jax_ops-level test
    "rife.WarpDs4": lambda n, i, w, c: [
        resize_bilinear(
            warp(i[0], i[1]), i[0].shape[1] // 4, i[0].shape[2] // 4
        )
    ],
    # fused render tail (graph/rewrite.py fuse_render_blend): the oracle
    # keeps the composed warp+blend algebra
    "rife.RenderBlend": lambda n, i, w, c: [
        warp(i[0], i[1]) * i[4] + warp(i[2], i[3]) * (1.0 - i[4])
    ],
    # paired sibling warps (graph/rewrite.py fuse_sibling_warps): the
    # oracle runs the two halves independently
    "rife.WarpPair": lambda n, i, w, c: [warp(i[0], i[1]), warp(i[2], i[3])],
    "rife.WarpDs4Pair": lambda n, i, w, c: [
        resize_bilinear(
            warp(i[0], i[1]), i[0].shape[1] // 4, i[0].shape[2] // 4
        ),
        resize_bilinear(
            warp(i[2], i[3]), i[2].shape[1] // 4, i[2].shape[2] // 4
        ),
    ],
}
