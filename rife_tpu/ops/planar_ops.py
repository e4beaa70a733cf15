"""Planar op table — the narrow-channel execution mode, carried as BHCW.

XLA:TPU lane-pads feature-minor layouts to 128 channels; for the zoo's
narrow layers (3-48 channels at up to full 1088x1920 resolution) that is
10-40x HBM bloat and the dominant cost of the measured step (BASELINE.md
"Conv/layout floor analysis").  In planar mode a net's blobs are carried as
``(B, H, C, W)`` — W on lanes, channels on sublanes, ZERO padding waste —
and:

* narrow convs run on the planar Pallas GEMM kernel (ops/conv_planar.py),
  whose native input layout IS BHCW (each row is a contiguous (C, W)
  channel slab, directly consumable by the MXU dot).  Crucially, the
  stride-2 H-phase split is a FREE reshape of BHCW ((B,H,C,W) ->
  (B,H/2,2C,W)) — any other planar layout pays an expensive HBM relayout
  per conv (measured 12-38 ms per call at B=24 1080p, tools/planar_fmt.py);
* the Pallas warp kernels emit/consume BHCW at zero extra cost (they
  operate plane-wise internally either way);
* wide convs/deconvs convert to NHWC, use the XLA MXU conv, and convert
  back (region planning keeps them OUT of planar regions instead);
* everything else (PReLU, resize, concat/slice/crop, pixelshuffle,
  pooling, elementwise) is implemented natively on BHCW.

``graph.executor.RegionExecutor`` mixes this table with the NHWC one under
the layout plan (graph/layout.py); ``PlanarExecutor`` wraps whole nets.
Reference semantics are identical to ``jax_ops``; parity is pinned by
tests/test_planar_ops.py and tests/test_layout.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import common as C
from . import jax_ops as J
from .conv_planar import (
    ACT_LEAKY,
    ACT_NONE,
    ACT_PRELU,
    ACT_RELU,
    conv_planar,
    conv_planar_cat,
    deconv_planar,
)

_ACT_MAP = {C.ACT_NONE: ACT_NONE, C.ACT_RELU: ACT_RELU,
            C.ACT_LEAKY: ACT_LEAKY, C.ACT_PRELU_CH: ACT_PRELU}

CH_AXIS = 2  # BHCW: channels on sublanes


def _ax(axis: int, rank: int) -> int:
    """ncnn CHW-space axis -> BHCW tensor axis."""
    if rank == 4:
        return {0: 2, 1: 1, 2: 3}[axis]
    if rank == 2:
        if axis != 0:
            raise ValueError(f"axis {axis} invalid for rank-2 blob")
        return 1
    raise ValueError(f"unsupported tensor rank {rank}")


def _planar_conv_ok(cin, cout, h, w, stride, k, dilation, pad) -> bool:
    """Use the Pallas planar conv only where it measured faster than XLA
    (tools/planar_inprog.py / proto_s2_kernel.py): narrow channels (the
    size gate is the caller's)."""
    if dilation != 1 or k != 3 or pad != 1 or stride not in (1, 2):
        return False
    if stride == 2 and (h % 2 or w % 2):
        return False
    return min(cin, cout) <= 32 and max(cin, cout) <= 64


def _planar_deconv_ok(cin, cout, k, stride, pad) -> bool:
    if (k, stride, pad) != (4, 2, 1):
        return False
    return cout <= 24 or (cout <= 32 and cin <= 48)


def conv_wants_planar(node, h, w, cin, cout, ctx) -> bool:
    """Single source of truth for 'this conv should run on the planar Pallas
    kernel' — used both by the layout planner (graph/layout.py) and by the
    planar op table below, so a planner 'nchw' conv never silently falls
    back to the transpose-wrapped XLA path (the round-2 escape-mode trap)."""
    act, _ = C.activation_of(node)
    if act not in _ACT_MAP:
        return False
    _, k, dilation, stride, pad, _ = C.conv_hyperparams(node)
    big = ctx.get("planar_all") or h * w >= int(
        ctx.get("planar_min_hw", 400_000))
    return bool(big) and _planar_conv_ok(cin, cout, h, w, stride, k,
                                         dilation, pad)


def deconv_wants_planar(node, h, w, cin, cout, ctx) -> bool:
    act, _ = C.activation_of(node)
    if act not in _ACT_MAP:
        return False
    _, k, _, stride, pad, _ = C.conv_hyperparams(node)
    big = ctx.get("planar_all") or h * w >= int(
        ctx.get("planar_deconv_min_hw", 25_000))
    return bool(big) and _planar_deconv_ok(cin, cout, k, stride, pad)


def _to_nhwc(x):  # BHCW -> NHWC: swap the last two dims
    return x.transpose(0, 1, 3, 2)


def _to_bhcw(x):  # NHWC -> BHCW
    return x.transpose(0, 1, 3, 2)


def _op_convolution(node, inputs, w, ctx):
    _, k, dilation, stride, pad, _ = C.conv_hyperparams(node)
    x = inputs[0]
    hw = ctx["w"][node.name]["hwio"]
    bias = ctx["w"][node.name]["bias"]
    act, params = C.activation_of(node)
    slope = (ctx["w"][node.name].get("slope")
             if act == C.ACT_PRELU_CH else None)
    cin, cout = hw.shape[2], hw.shape[3]
    h, wid = x.shape[1], x.shape[3]
    if (ctx.get("use_pallas_warp")
            and conv_wants_planar(node, h, wid, cin, cout, ctx)):
        alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
        return [conv_planar(x, hw, bias, stride=stride, pad=pad,
                            act=_ACT_MAP[act], alpha=alpha, slope=slope)]
    y = J.conv2d(_to_nhwc(x), hw, bias, stride=stride, pad=pad,
                 dilation=dilation)
    if act == C.ACT_PRELU_CH:
        return [_to_bhcw(J._prelu_ch(y, slope))]
    return [_to_bhcw(J.apply_activation(y, act, params))]


def _op_convolution_cat(node, inputs, w, ctx):
    """ConvolutionCat on BHCW: when the conv runs on the direct stride-2
    Pallas kernel, the parts DMA into the band's 8-aligned channel slots
    and the concat never materializes; otherwise concat + delegate."""
    import os

    _, k, dilation, stride, pad, _ = C.conv_hyperparams(node)
    hw = ctx["w"][node.name]["hwio"]
    cin, cout = hw.shape[2], hw.shape[3]
    h, wid = inputs[0].shape[1], inputs[0].shape[3]
    act, params = C.activation_of(node)
    # conv_wants_planar's <=64-channel clause is a PERF gate; for the cat
    # form the alternative is materializing the full-res concat, whose
    # channel axis XLA lane-pads 12.8-128x at small batch (the v3.1 1080p
    # B=4 step exceeded HBM by gigabytes of pure padding, BASELINE.md
    # round-5) — so big cat-convs take the planar kernel up to 128
    # channels even where a plain conv would stay on XLA.
    wants = conv_wants_planar(node, h, wid, cin, cout, ctx)
    if not wants and act in _ACT_MAP and len(inputs) > 1:
        big = ctx.get("planar_all") or h * wid >= int(
            ctx.get("planar_min_hw", 400_000))
        wants = (big and dilation == 1 and k == 3 and pad == 1
                 and stride == 2 and not (h % 2 or wid % 2)
                 and max(cin, cout) <= 128)
    if (ctx.get("use_pallas_warp")
            and stride == 2
            and os.environ.get("RIFE_TPU_S2_DIRECT", "1") != "0"
            and wants):
        bias = ctx["w"][node.name]["bias"]
        slope = (ctx["w"][node.name].get("slope")
                 if act == C.ACT_PRELU_CH else None)
        alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
        return [conv_planar_cat(inputs, hw, bias, act=_ACT_MAP[act],
                                alpha=alpha, slope=slope)]
    return _op_convolution(
        node, [jnp.concatenate(inputs, axis=CH_AXIS)], w, ctx)


def _op_deconvolution(node, inputs, w, ctx):
    _, k, _, stride, pad, _ = C.conv_hyperparams(node)
    x = inputs[0]
    hw = ctx["w"][node.name]["hwio"]
    bias = ctx["w"][node.name]["bias"]
    act, params = C.activation_of(node)
    slope = (ctx["w"][node.name].get("slope")
             if act == C.ACT_PRELU_CH else None)
    cin, cout = hw.shape[2], hw.shape[3]
    h, wid = x.shape[1], x.shape[3]
    if (ctx.get("use_pallas_warp")
            and deconv_wants_planar(node, h, wid, cin, cout, ctx)):
        alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
        return [deconv_planar(x, hw, bias, act=_ACT_MAP[act], alpha=alpha,
                              slope=slope)]
    y = J.deconv2d(_to_nhwc(x), hw, bias, stride=stride, pad=pad)
    if act == C.ACT_PRELU_CH:
        return [_to_bhcw(J._prelu_ch(y, slope))]
    return [_to_bhcw(J.apply_activation(y, act, params))]


def _op_conv_ps(node, inputs, w, ctx):
    """rife.ConvPS / rife.DeconvPS on BHCW: the PixelShuffle's channel
    regrouping is baked into the conv's output-channel order (a static
    weight permutation, conv_planar.{conv,deconv}_ps_planar), so only one
    W lane-interleave remains and the pre-shuffle tensor never hits HBM."""
    from .conv_planar import conv_ps_planar, deconv_ps_planar

    x = inputs[0]
    hw = ctx["w"][node.name]["hwio"]
    bias = ctx["w"][node.name]["bias"]
    act, params = C.activation_of(node)
    slope = (ctx["w"][node.name].get("slope")
             if act == C.ACT_PRELU_CH else None)
    cin, cout = hw.shape[2], hw.shape[3]
    h, wid = x.shape[1], x.shape[3]
    r = int(node.p(25, 2))
    _, k, dilation, stride, pad, _ = C.conv_hyperparams(node)
    if node.type == "rife.DeconvPS":
        ok = (ctx.get("use_pallas_warp")
              and deconv_wants_planar(node, h, wid, cin, cout, ctx))
        if ok:
            alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
            return [deconv_ps_planar(x, hw, bias, act=_ACT_MAP[act],
                                     alpha=alpha, slope=slope)]
    else:
        ok = (ctx.get("use_pallas_warp")
              and conv_wants_planar(node, h, wid, cin, cout, ctx))
        if ok:
            alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
            return [conv_ps_planar(x, hw, bias, r=r, stride=stride, pad=pad,
                                   act=_ACT_MAP[act], alpha=alpha,
                                   slope=slope)]
    return [_to_bhcw(J._op_conv_ps(node, [_to_nhwc(x)], w, ctx)[0])]


def _op_prelu(node, inputs, w, ctx):
    x = inputs[0]
    slope = ctx["w"][node.name]["slope"].astype(x.dtype)
    if x.ndim == 4:
        slope = slope.reshape(1, 1, -1, 1)
    return [jnp.where(x >= 0, x, x * slope)]


def resize2d_bhcw(x, out_h, out_w, method="bilinear"):
    """Half-pixel resize on BHCW — exact same phase-decomposed path as
    jax_ops.resize2d, on axes (1, 3)."""
    b, h, c, w = x.shape
    if (out_h, out_w) == (h, w):
        return x
    if method == "bilinear":
        y = x
        ok = True
        for axis, (src, dst) in ((1, (h, out_h)), (3, (w, out_w))):
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
    return jax.image.resize(x, (b, out_h, c, out_w), method=mth,
                            antialias=False)


def _op_interp(node, inputs, w, ctx):
    x = inputs[0]
    rtype, oh, ow = C.interp_out_size(x.shape[1], x.shape[3], node)
    method = {1: "nearest", 2: "bilinear"}[rtype]
    return [resize2d_bhcw(x, oh, ow, method)]


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
    return [jnp.mean(inputs[0], axis=(1, 3))]  # (B,C)


def _op_pixelshuffle(node, inputs, w, ctx):
    """BHCW pixelshuffle: (B,H,c*r*r,W) -> (B,H*r,c,W*r); the H interleave
    (channel index i) is a cheap sublane move, the W interleave (j) a lane
    interleave — identical work to the NCHW form."""
    r = int(node.p(0, 1))
    x = inputs[0]
    b, h, crr, w_ = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, c, r, r, w_)       # (B,H,c,i,j,W)
    x = x.transpose(0, 1, 3, 2, 5, 4)      # (B,H,i,c,W,j)
    return [x.reshape(b, h * r, c, w_ * r)]


def _op_binaryop(node, inputs, w, ctx):
    op = int(node.p(0, 0))
    if int(node.p(1, 0)) == 1:
        b = jnp.asarray(float(node.p(2, 0.0)), dtype=inputs[0].dtype)
        return [J.binary_op(op, inputs[0], b)]
    a, b = inputs
    # ncnn (B,C) vector vs (B,H,C,W) map broadcast (v1 SE scale)
    if a.ndim == 2 and b.ndim == 4:
        a = a[:, None, :, None]
    elif a.ndim == 4 and b.ndim == 2:
        b = b[:, None, :, None]
    return [J.binary_op(op, a, b)]


def _warp_u8_eligible(node, image_bhcw, ctx, img_slot: int = 0) -> bool:
    return (
        not ctx.get("no_u8_warp")
        and image_bhcw.shape[CH_AXIS] <= 4
        and node.bottoms[img_slot] in ctx.get("u8_image_blobs", ())
    )


def _op_warp_planar(node, inputs, w, ctx):
    """rife.Warp on BHCW: (B,H,C,W) x (B,H,2,W) -> (B,H,C,W).  The Pallas
    kernels pack/emit per-channel planes natively, so planar mode removes
    both boundary transposes (reference op: /root/reference/src/warp.comp)."""
    import os

    image, flow = inputs[0], inputs[1]
    if ctx.get("use_pallas_warp"):
        from .warp_pallas import fits_vmem, warp_pallas

        u8 = _warp_u8_eligible(node, image, ctx)
        if u8 or fits_vmem(image.shape[1], image.shape[3]):
            variant = ctx.get("warp_variant") or os.environ.get(
                "RIFE_TPU_WARP_VARIANT", "auto")
            J._warp_debug(node, "pallas_planar", image, ctx, u8=u8,
                          variant=variant)
            return [warp_pallas(image, flow, u8_origin=u8,
                                u8_variant=variant, planar=True)]
    J._warp_debug(node, "xla_planar", image, ctx)
    return [_to_bhcw(J.warp(_to_nhwc(image), _to_nhwc(flow)))]


def _op_warp_ds4_planar(node, inputs, w, ctx):
    """rife.WarpDs4 on BHCW (fused warp + exact 1/4 downscale; see
    jax_ops._op_warp_ds4 for the tap-grid derivation)."""
    from jax import lax

    image, flow = inputs[0], inputs[1]
    h, wid = image.shape[1], image.shape[3]
    if h % 4 or wid % 4:  # padded canvases are 32-aligned; belt-and-braces
        y = _op_warp_planar(node, inputs, w, ctx)[0]
        return [resize2d_bhcw(y, int(round(h * 0.25)),
                              int(round(wid * 0.25)))]
    flow_c = J._compact_taps4(J._compact_taps4(flow, 1), 3)
    ho, wo = h // 2, wid // 2
    iy = lax.broadcasted_iota(jnp.int32, (ho, wo), 0)
    ix = lax.broadcasted_iota(jnp.int32, (ho, wo), 1)
    gy = ((iy // 2) * 4 + 1 + (iy % 2)).astype(jnp.float32)
    gx = ((ix // 2) * 4 + 1 + (ix % 2)).astype(jnp.float32)
    sx = gx[None] + flow_c[:, :, 0, :].astype(jnp.float32)
    sy = gy[None] + flow_c[:, :, 1, :].astype(jnp.float32)

    if ctx.get("use_pallas_warp"):
        from .warp_pallas import fits_vmem, warp_pallas

        u8 = _warp_u8_eligible(node, image, ctx)
        if u8 or fits_vmem(h, wid):
            pos = jnp.stack([sx, sy], axis=2)  # (B,Ho,2,Wo)
            y = warp_pallas(image, pos, u8_origin=u8, abs_pos=True,
                            planar=True)
        else:
            y = _to_bhcw(J.warp_at(_to_nhwc(image), sy, sx))
    else:
        y = _to_bhcw(J.warp_at(_to_nhwc(image), sy, sx))
    return [J._downsample_axis(J._downsample_axis(y, 2, 1), 2, 3)]


def _op_warp_pair_planar(node, inputs, w, ctx):
    """rife.WarpPair on BHCW: planes are the pair kernel's native layout,
    so the fused path (both u8-quad, slab/tall/inflow) runs one
    pallas_call; otherwise two single planar warps (identical math)."""
    img_a, flow_a, img_b, flow_b = inputs
    u8_ok = (J._pair_kernel_ok_base(ctx)
             and img_a.shape == img_b.shape
             and flow_a.shape == flow_b.shape
             and _warp_u8_eligible(node, img_a, ctx, img_slot=0)
             and _warp_u8_eligible(node, img_b, ctx, img_slot=2))
    if u8_ok:
        from .warp_pallas import warp_pallas_pair

        J._warp_debug(node, "pallas_pair_planar", img_a, ctx, u8=True)
        out_a, out_b = warp_pallas_pair(img_a, flow_a, img_b, flow_b,
                                        planar=True)
        return [out_a, out_b]
    J._warp_debug(node, "pair_fallback_planar", img_a, ctx)
    return [
        _op_warp_planar(J._single_warp_node(node, 0), [img_a, flow_a],
                        w, ctx)[0],
        _op_warp_planar(J._single_warp_node(node, 1), [img_b, flow_b],
                        w, ctx)[0],
    ]


def _op_warp_ds4_pair_planar(node, inputs, w, ctx):
    """rife.WarpDs4Pair on BHCW (see jax_ops._op_warp_ds4_pair)."""
    def half(i, img, fl):
        shim = J._single_warp_node(node, i)
        shim = type(shim)("rife.WarpDs4", shim.name, shim.bottoms,
                          shim.tops, {})
        return _op_warp_ds4_planar(shim, [img, fl], w, ctx)[0]

    img_a, flow_a, img_b, flow_b = inputs
    h, wid = img_a.shape[1], img_a.shape[3]
    u8_ok = (h % 4 == 0 and wid % 4 == 0
             and J._pair_kernel_ok_base(ctx)
             and img_a.shape == img_b.shape
             and flow_a.shape == flow_b.shape
             and _warp_u8_eligible(node, img_a, ctx, img_slot=0)
             and _warp_u8_eligible(node, img_b, ctx, img_slot=2))
    if u8_ok:
        from jax import lax

        from .warp_pallas import warp_pallas_pair

        def pos(flow):
            flow_c = J._compact_taps4(J._compact_taps4(flow, 1), 3)
            ho, wo = h // 2, wid // 2
            iy = lax.broadcasted_iota(jnp.int32, (ho, wo), 0)
            ix = lax.broadcasted_iota(jnp.int32, (ho, wo), 1)
            gy = ((iy // 2) * 4 + 1 + (iy % 2)).astype(jnp.float32)
            gx = ((ix // 2) * 4 + 1 + (ix % 2)).astype(jnp.float32)
            sx = gx[None] + flow_c[:, :, 0, :].astype(jnp.float32)
            sy = gy[None] + flow_c[:, :, 1, :].astype(jnp.float32)
            return jnp.stack([sx, sy], axis=2)  # (B,Ho,2,Wo)

        J._warp_debug(node, "pallas_ds4_pair_planar", img_a, ctx, u8=True)
        y_a, y_b = warp_pallas_pair(img_a, pos(flow_a), img_b, pos(flow_b),
                                    abs_pos=True, planar=True)
        return [
            J._downsample_axis(J._downsample_axis(y_a, 2, 1), 2, 3),
            J._downsample_axis(J._downsample_axis(y_b, 2, 1), 2, 3),
        ]
    J._warp_debug(node, "ds4_pair_fallback_planar", img_a, ctx)
    return [half(0, img_a, flow_a), half(1, img_b, flow_b)]


def _op_warp_ds2_planar(node, inputs, w, ctx):
    """rife.WarpDs2 on BHCW (fused warp + exact 1/2 downscale; see
    jax_ops._op_warp_ds2 for the phase decomposition)."""
    image, flow = inputs[0], inputs[1]
    h, wid = image.shape[1], image.shape[3]
    if not (h % 2 or wid % 2) and ctx.get("use_pallas_warp"):
        if _warp_u8_eligible(node, image, ctx):
            from .warp_pallas import warp_ds2_pallas

            J._warp_debug(node, "pallas_ds2_planar", image, ctx, u8=True)
            return [warp_ds2_pallas(image, flow, planar=True)]
    y = _op_warp_planar(node, inputs, w, ctx)[0]
    return [resize2d_bhcw(y, int(round(h * 0.5)), int(round(wid * 0.5)))]


def _op_render_blend_planar(node, inputs, w, ctx):
    """rife.RenderBlend on BHCW: the inputs are already planes, so the
    warps run planar end-to-end and the blend is plain plane math (see
    jax_ops._op_render_blend for the fusion rationale)."""
    img_m, flow_m, img_inv, flow_inv, mask = inputs
    wm = _op_warp_planar(node, [img_m, flow_m], w, ctx)[0]
    # the second image blob is node.bottoms[2]; reuse the planar warp with
    # a shim node so the u8 check keys on the right blob
    shim = type(node)(node.type, node.name,
                      [node.bottoms[2], node.bottoms[3]], list(node.tops),
                      node.params)
    wi = _op_warp_planar(shim, [img_inv, flow_inv], w, ctx)[0]
    one = jnp.asarray(1.0, mask.dtype)
    return [wm * mask + wi * (one - mask)]


OP_TABLE_PLANAR = {
    "Convolution": _op_convolution,
    "ConvolutionCat": _op_convolution_cat,
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
    "rife.ConvPS": _op_conv_ps,
    "rife.DeconvPS": _op_conv_ps,
    "rife.Warp": _op_warp_planar,
    "rife.WarpDs4": _op_warp_ds4_planar,
    "rife.WarpDs2": _op_warp_ds2_planar,
    "rife.WarpPair": _op_warp_pair_planar,
    "rife.WarpDs4Pair": _op_warp_ds4_pair_planar,
    "rife.RenderBlend": _op_render_blend_planar,
}
