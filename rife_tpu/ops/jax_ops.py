"""TPU-native (JAX/XLA) implementations of the ncnn layer set used by the zoo.

Everything is NHWC (batch, height, width, channel) — channels ride the TPU
lane dimension, convolutions lower straight onto the MXU via
``lax.conv_general_dilated``.  The op table covers the full layer histogram of
the 29 shipped .param graphs (SURVEY.md §2.3): Convolution, Deconvolution,
InnerProduct, PReLU, ReLU, Sigmoid, Clip, Pooling(global-avg), Interp,
Concat, Crop, Slice, Split, BinaryOp, UnaryOp, Eltwise, PixelShuffle and the
custom ``rife.Warp``.

Reference semantics cross-checked against:
* warp:      /root/reference/src/warp.comp:42-63 (clamp corners, then lerp)
* resize:    ncnn Interp bilinear, align_corners=False half-pixel, no AA
* deconv:    ncnn Deconvolution == torch ConvTranspose2d (IOHW weights)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph.weights import LayerWeights
from . import common as C

DIMSPEC = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# functional primitives
# ---------------------------------------------------------------------------

def _conv_precision(x):
    # f32 activations ask for true-f32 MXU passes; bf16 runs native.
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else lax.Precision.DEFAULT


def _conv_out_dtype(x):
    # The MXU accumulates in f32 regardless; asking for a bf16 result rounds
    # once on output — numerically identical to f32-out + astype(bf16), but
    # halves the materialized conv-output traffic (the step is HBM-bound).
    return x.dtype if x.dtype == jnp.bfloat16 else jnp.float32


def conv2d(x, w_hwio, bias, *, stride=1, pad=0, dilation=1):
    """NHWC conv. ``w_hwio`` is (kh, kw, in, out)."""
    y = lax.conv_general_dilated(
        x,
        w_hwio.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=DIMSPEC,
        preferred_element_type=_conv_out_dtype(x),
        precision=_conv_precision(x),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def deconv2d(x, w_hwio_flipped, bias, *, stride=2, pad=1):
    """NHWC transposed conv (torch ConvTranspose2d semantics).

    ``w_hwio_flipped`` is the ConvTranspose kernel already spatially flipped
    and laid out (kh, kw, in, out); the op is then an input-dilated conv with
    padding k-1-p. Output size = (in-1)*stride - 2*pad + k.
    """
    k = w_hwio_flipped.shape[0]
    eff = k - 1 - pad
    y = lax.conv_general_dilated(
        x,
        w_hwio_flipped.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(eff, eff), (eff, eff)],
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMSPEC,
        preferred_element_type=_conv_out_dtype(x),
        precision=_conv_precision(x),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def space_to_depth(x, r: int = 2):
    """(B,H,W,C) -> (B,H/r,W/r,r*r*C); channel order (qi, qj, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x, r: int = 2):
    b, h, w, rrc = x.shape
    c = rrc // (r * r)
    x = x.reshape(b, h, w, r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c)


def s2d_conv_kernel(w_hwio):
    """Transform a 3x3 kernel so that
    ``depth_to_space(conv3x3p1(space_to_depth(x), W2)) == conv3x3p1(x, w)``.

    Narrow-channel full-resolution convs (the v2 fusionnet U-Net runs
    C=16-32 at 1088x1920 — 1-2% MXU peak) quadruple their channel dims by
    moving 2x2 pixel blocks into channels; the block conv costs 4x the
    FLOPs at better lane occupancy.  Exact for stride 1, pad 1, even H/W.

    MEASURED SLOWER on v5e (direct/s2d ms at B=4 bf16: 16ch@1080p 20/40,
    32ch@1080p 34/44, 64ch@540p 15/20) — XLA's direct conv handles narrow
    channels better than raw channel-sweep numbers suggested, and the 4x
    FLOPs + relayout dominate.  Kept (exact + tested) as a documented dead
    end; do not wire into the executor without new evidence.

    Derivation: output pixel (2m+pi, 2n+pj) tap di reads input row
    2(m+a)+qi with a=(pi+di-1)//2, qi=(pi+di-1)%2 — every (pi,di) lands in
    block offset a in {-1,0,1}, so the block conv is again 3x3 with the
    taps scattered over (block offset, phase) pairs.
    """
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 3 and kw == 3
    w2 = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    w_np = np.asarray(w_hwio, np.float32)
    for pi in range(2):
        for di in range(3):
            u = pi + di - 1
            a, qi = u // 2, u % 2
            for pj in range(2):
                for dj in range(3):
                    v = pj + dj - 1
                    bo, qj = v // 2, v % 2
                    w2[
                        a + 1, bo + 1,
                        (qi * 2 + qj) * cin : (qi * 2 + qj + 1) * cin,
                        (pi * 2 + pj) * cout : (pi * 2 + pj + 1) * cout,
                    ] += w_np[di, dj]
    return jnp.asarray(w2, w_hwio.dtype)


def conv2d_s2d(x, w2_hwio, bias):
    """3x3/s1/p1 conv evaluated in space-to-depth form (see
    ``s2d_conv_kernel``); ``bias`` is the ORIGINAL per-channel bias."""
    y2 = conv2d(space_to_depth(x), w2_hwio, None, stride=1, pad=1)
    y = depth_to_space(y2)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _interleave_minor(a, b):
    """Interleave two equal-shape bf16 arrays along the MINOR axis:
    out[..., 2i] = a[..., i], out[..., 2i+1] = b[..., i].

    Implemented as u32 word packing (little-endian: the low half-word is
    the even element), i.e. pure elementwise bitcasts the VPU fuses into
    the producers — XLA's stack+reshape form of the same movement emits a
    (…,n,2) transpose copy with T(2,128) tiling that measured 8-14 ms per
    full-res tensor in the v4.6 step (the PixelShuffle/upsample
    interleaves).  Bit-exact: data movement only."""
    au = lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
    bu = lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    w = au | (bu << 16)
    # bitcast u32 -> u16 appends a trailing 2-axis (little-endian order)
    return lax.bitcast_convert_type(
        lax.bitcast_convert_type(w, jnp.uint16), jnp.bfloat16
    ).reshape(*a.shape[:-1], a.shape[-1] * 2)


def _interleave_list_minor(ps):
    """out[n*m + p] = ps[p][..., m] on the minor axis, by recursive pair
    interleaving (evens feed the low half-words): exact for n = 2^k."""
    if len(ps) == 1:
        return ps[0]
    return _interleave_minor(
        _interleave_list_minor(ps[0::2]), _interleave_list_minor(ps[1::2])
    )


def _upsample_axis(x, n: int, axis: int):
    """Exact half-pixel bilinear x``n`` upsample along ``axis`` via phase
    decomposition: out[n*m+p] = (1-f_p)*in[m+d_p] + f_p*in[m+d_p+1].  Pure
    shifts/lerps/interleave — XLA fuses to VPU ops (the general gather-based
    resize costs ~10ms for a 1080p plane on v5e; this is bandwidth-bound)."""
    size = x.shape[axis]
    idx = lambda s: tuple(
        s if a == axis else slice(None) for a in range(x.ndim)
    )
    phases = []
    for p in range(n):
        src = (p + 0.5) / n - 0.5
        d = int(np.floor(src))
        f = src - d
        lo = jnp.clip(jnp.arange(size) + d, 0, size - 1)
        hi = jnp.clip(jnp.arange(size) + d + 1, 0, size - 1)
        a = jnp.take(x, lo, axis=axis)
        bb = jnp.take(x, hi, axis=axis)
        phases.append(a * jnp.asarray(1.0 - f, x.dtype) + bb * jnp.asarray(f, x.dtype))
    if (axis == x.ndim - 1 and x.dtype == jnp.bfloat16
            and n & (n - 1) == 0
            and os.environ.get("RIFE_TPU_BITCAST_RESIZE", "0") != "0"):
        # minor-axis phase recomposition via u32 word packing
        # (_interleave_minor).  Measured NET-NEGATIVE as the default
        # (headline 49.3 -> 45.7): between elementwise neighbours XLA
        # already recomposes phases by layout assignment, and the integer
        # packing forces a real materialization.  Kept as a knob; the win
        # shows only where the consumer forces materialization anyway
        # (pixel_shuffle's NCHW interleave).
        return _interleave_list_minor(phases)
    stacked = jnp.stack(phases, axis=axis + 1)  # (..., size, n, ...)
    new_shape = list(x.shape)
    new_shape[axis] = size * n
    return stacked.reshape(new_shape)


def _deinterleave_minor(x):
    """Split the minor axis into (even, odd) element streams — the inverse
    of _interleave_minor, same elementwise-bitcast rationale (a strided
    lane slice is a relayout copy; halfword extraction is VPU arithmetic
    the producers fuse)."""
    xu = lax.bitcast_convert_type(x, jnp.uint16)
    w = lax.bitcast_convert_type(
        xu.reshape(*x.shape[:-1], x.shape[-1] // 2, 2), jnp.uint32
    )
    even = lax.bitcast_convert_type(
        (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    odd = lax.bitcast_convert_type(
        (w >> 16).astype(jnp.uint16), jnp.bfloat16)
    return even, odd


def _destride_minor(x, n: int, start: int):
    """x[..., start::n] for power-of-two n via recursive deinterleaving."""
    if n == 1:
        return x
    even, odd = _deinterleave_minor(x)
    if start % 2 == 0:
        return _destride_minor(even, n // 2, start // 2)
    return _destride_minor(odd, n // 2, start // 2)


def _downsample_axis(x, n: int, axis: int):
    """Exact half-pixel bilinear 1/``n`` downsample (even n): the source
    coordinate (m+0.5)*n-0.5 always lands halfway between two taps."""
    assert n % 2 == 0
    size = x.shape[axis]

    def take(start):
        if (axis == x.ndim - 1 and x.dtype == jnp.bfloat16
                and n & (n - 1) == 0 and size % n == 0
                and os.environ.get("RIFE_TPU_BITCAST_RESIZE", "0") != "0"):
            return _destride_minor(x, n, start)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(start, size, n)
        return x[tuple(sl)]

    half = jnp.asarray(0.5, x.dtype)
    return take(n // 2 - 1) * half + take(n // 2) * half


def resize2d(x, out_h, out_w, method="bilinear"):
    """Half-pixel (align_corners=False), no anti-aliasing — ncnn/torch parity.

    Integer and 1/even-integer scale factors (the only ones in the model zoo:
    16, 8, 4, 2, 1/2, 1/4, 1/8) take an exact phase-decomposed VPU path; any
    other ratio falls back to jax.image.resize.

    Narrow-channel tensors (flows, masks, images: C <= 8) run the phase
    path in NCHW internally: XLA lane-pads feature-minor layouts to 128,
    so the take/stack intermediates of the NHWC form cost 16-42x their
    true bytes in HBM (they were the single largest padded-buffer class
    in the compiled v4.6 step — see BASELINE.md).  The surrounding
    transposes sit between elementwise ops, where XLA is free to pick
    matching layouts, and the per-channel arithmetic is identical."""
    b, h, w, c = x.shape
    if (out_h, out_w) == (h, w):
        return x
    if method == "bilinear":
        nchw = 1 < c <= 8
        y = x.transpose(0, 3, 1, 2) if nchw else x
        a0 = 2 if nchw else 1
        ok = True
        for axis, (src, dst) in ((a0, (h, out_h)), (a0 + 1, (w, out_w))):
            if dst == src:
                continue
            if dst % src == 0:
                y = _upsample_axis(y, dst // src, axis)
            elif src % dst == 0 and (src // dst) % 2 == 0:
                y = _downsample_axis(y, src // dst, axis)
            else:
                ok = False
                break
        if ok:
            return y.transpose(0, 2, 3, 1) if nchw else y
    mth = "linear" if method == "bilinear" else method
    return jax.image.resize(x, (b, out_h, out_w, c), method=mth, antialias=False)


def warp(image, flow):
    """Backward bilinear warp, bit-faithful to /root/reference/src/warp.comp.

    image: (B,H,W,C); flow: (B,H,W,2) with channels (flow_x, flow_y).
    Sample position = pixel + flow; corner indices are clamped to the image
    *before* the fractions are taken (shader lines 42-55), which collapses to
    edge-replicate sampling.
    """
    h, w = image.shape[1], image.shape[2]
    gy = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = gx[None] + flow[..., 0].astype(jnp.float32)
    sy = gy[None] + flow[..., 1].astype(jnp.float32)
    return warp_at(image, sy, sx)


def warp_at(image, sy, sx):
    """Backward bilinear sampling of ``image`` at ABSOLUTE positions
    (sy, sx) of shape (B, Ho, Wo) — same clamped-corner algebra as ``warp``
    but with a caller-chosen output grid (the fused downscaled-warp rewrite
    samples on the Interp tap grid, graph/rewrite.py).

    Large batches are processed in sequential chunks (``lax.map``): the
    gather form holds ~10 full-res f32/i32 planes live per warp (positions,
    four corner indices, four gathered corner tensors), which at B=30 1080p
    inflates a warp site to ~3 GB and OOMs the 16 G HBM when the whole v4
    step routes through the XLA warps (the flow-independent worst-case
    variant, engine/session.py::_resolve_warp_variant).  Every op is
    per-batch-element, so chunking changes results only through XLA's
    per-program FMA re-association of the lerp chain (~1 ulp f32); it
    bounds the live set to one chunk."""
    b, h, w, c = image.shape
    ho, wo = sy.shape[1], sy.shape[2]
    if b >= 8 and ho * wo >= (1 << 20):
        cs = next((d for d in (8, 6, 5, 4, 3, 2)
                   if b % d == 0 and d < b), None)
        if cs is not None:
            body = lambda args: warp_at(*args)  # noqa: E731
            out = lax.map(
                body,
                (image.reshape(b // cs, cs, h, w, c),
                 sy.reshape(b // cs, cs, ho, wo),
                 sx.reshape(b // cs, cs, ho, wo)))
            return out.reshape(b, ho, wo, c)

    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    # fractions relative to the *clamped* corner, as the shader computes them
    alpha = (sx - x0.astype(jnp.float32)).astype(image.dtype)[..., None]
    beta = (sy - y0.astype(jnp.float32)).astype(image.dtype)[..., None]

    flat = image.reshape(b, h * w, c)

    def gather(yy, xx):
        idx = yy * w + xx
        return jnp.take_along_axis(
            flat, idx.reshape(b, ho * wo, 1), axis=1
        ).reshape(b, ho, wo, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - alpha) + v01 * alpha
    bot = v10 * (1 - alpha) + v11 * alpha
    return top * (1 - beta) + bot * beta


_spatial_fallback_warned: set = set()


def _warn_spatial_fallback(shape, mesh_dims):
    key = (tuple(shape), mesh_dims)
    if key not in _spatial_fallback_warned:
        _spatial_fallback_warned.add(key)
        import warnings

        warnings.warn(
            f"warp_spatial: batch {shape[0]} not divisible by the batch "
            f"mesh axis {mesh_dims[0]}; falling back to the partitioned "
            f"XLA gather warp (~1000x the Pallas warp at 4K). Use a batch "
            f"that is a multiple of the batch mesh extent.",
            stacklevel=3)


def warp_spatial(image, sy, sx, ctx, *, u8=False, variant="auto"):
    """Height-sharded backward warp for giant frames split across a mesh
    axis (``ctx['spatial_warp'] = (mesh, height_axis, batch_axis)``).

    Each shard all-gathers the SOURCE frame over the spatial axis (ICI)
    and samples only its own output rows — a backward warp may read any
    source row (the flow is data), so the only exact "halo" is the whole
    frame, and at u8 frame sizes the gather is cheap next to the sharded
    activations GSPMD keeps local.  u8-origin images ride the Pallas slab
    kernel per shard (replacing the partitioned-XLA-gather fallback that
    measured ~1000x Pallas cost at 4K, BASELINE.md round-1); float
    features take a dense local gather on the gathered source.  Output
    rows match unsharded execution exactly (same float math, global
    coordinates).  Reference long-frame analog: UHD mode
    /root/reference/src/rife.cpp:294-332 (no spatial tiling exists there).
    """
    mesh, axis, baxis = ctx["spatial_warp"]
    from jax.sharding import PartitionSpec as SP

    n_sp = int(mesh.shape[axis])
    n_b = int(mesh.shape[baxis]) if baxis is not None else 1
    if image.shape[0] % n_b:
        # batch not divisible by the batch mesh axis — a session config
        # error rather than a shape accident; warn ONCE and fall back to
        # the partitioned XLA gather (~1000x the Pallas warp at 4K,
        # BASELINE.md round-1) instead of failing.
        _warn_spatial_fallback(image.shape, (n_b, n_sp))
        return warp_at(image, sy, sx)
    ho = sy.shape[1]
    hs = image.shape[1]
    if hs % n_sp or ho % n_sp:
        # Shard_map needs evenly divisible block shapes; odd pyramid
        # levels (non-32-aligned inputs, e.g. a 736-row 720p frame on an
        # 8-shard mesh at the 1/8 tap -> 92 rows) get PADDED to the mesh
        # multiple instead of silently reverting to the XLA gather.
        # Source rows pad by edge replication: the kernels clamp sample
        # rows to [0, padded_h-1], and every padded row equals the true
        # last row, so any clamp/lerp that touches them reproduces the
        # shader's clamp-to-edge exactly.  Padded OUTPUT rows are sliced
        # off below.
        hs_p = (hs + n_sp - 1) // n_sp * n_sp
        ho_p = (ho + n_sp - 1) // n_sp * n_sp
        if hs_p != hs:
            image = jnp.pad(
                image, ((0, 0), (0, hs_p - hs)) + ((0, 0),) * (image.ndim - 2),
                mode="edge")
        if ho_p != ho:
            pad = ((0, 0), (0, ho_p - ho), (0, 0))
            sy = jnp.pad(sy, pad, mode="edge")
            sx = jnp.pad(sx, pad, mode="edge")
        out = warp_spatial(image, sy, sx, ctx, u8=u8, variant=variant)
        return out[:, :ho]
    if u8 and ctx.get("use_pallas_warp"):
        from .warp_pallas import warp_pallas_spatial

        pos = jnp.stack([sx, sy], axis=-1)
        return warp_pallas_spatial(
            image, pos, mesh, axis, batch_axis=baxis,
            u8_origin=True, variant=variant,
        )

    img_spec = SP(baxis, axis, None, None)
    pos_spec = SP(baxis, axis, None)

    def local(img, syl, sxl):
        full = lax.all_gather(img, axis, axis=1, tiled=True)
        return warp_at(full, syl, sxl)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(img_spec, pos_spec, pos_spec),
        out_specs=img_spec, check_vma=False,
    )(image, sy, sx)


def pixel_shuffle(x, r):
    """torch.pixel_shuffle semantics in NHWC: C = c*r^2 + i*r + j.

    Narrow tensors (the zoo's pixelshuffles are all 22-24ch -> 5-6ch)
    run the shuffle in NCHW internally — the NHWC interleave's
    feature-minor intermediates are lane-padded 5-21x (see resize2d)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    if crr <= 32:
        y = x.transpose(0, 3, 1, 2).reshape(b, c, r, r, h, w)
        if (r == 2 and x.dtype == jnp.bfloat16 and os.environ.get(
                "RIFE_TPU_BITCAST_RESIZE", "0") != "0"):
            # W-interleave as elementwise word packing.  Measured a WASH
            # on the v4.6 headline (48.9 vs 49.3 fps): the u32 packing
            # replaces the T(2,128) transpose copies but adds VPU passes
            # XLA cannot fuse into the surrounding chain.  Same knob as
            # the resize interleaves; kept as a measured dead end.
            rows = [_interleave_minor(y[:, :, i, 0], y[:, :, i, 1])
                    for i in range(2)]
            out = jnp.stack(rows, axis=3).reshape(b, c, h * 2, w * 2)
            return out.transpose(0, 2, 3, 1)
        y = y.transpose(0, 1, 4, 2, 5, 3).reshape(b, c, h * r, w * r)
        return y.transpose(0, 2, 3, 1)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def apply_activation(x, act, params):
    if act == C.ACT_NONE:
        return x
    if act == C.ACT_RELU:
        return jnp.maximum(x, 0)
    if act == C.ACT_LEAKY:
        slope = jnp.asarray(params[0], dtype=x.dtype)
        if (0.0 < float(params[0]) < 1.0
                and os.environ.get("RIFE_TPU_LEAKY_MAX", "0") != "0"):
            return jnp.maximum(x, x * slope)  # exact; see _op_relu
        return jnp.where(x >= 0, x, x * slope)
    if act == C.ACT_CLIP:
        return jnp.clip(x, params[0], params[1])
    if act == C.ACT_SIGMOID:
        return jax.nn.sigmoid(x)
    raise NotImplementedError(f"activation {act}")


def _broadcast_pair(a, b):
    """ncnn-style broadcast between (B,C) vectors and (B,H,W,C) maps."""
    if a.ndim == b.ndim:
        return a, b
    if a.ndim == 2 and b.ndim == 4:
        return a[:, None, None, :], b
    if a.ndim == 4 and b.ndim == 2:
        return a, b[:, None, None, :]
    raise ValueError(f"cannot broadcast ranks {a.ndim} vs {b.ndim}")


def binary_op(op, a, b):
    if hasattr(b, "ndim") and b.ndim > 0:
        a, b = _broadcast_pair(a, b)
    if op == C.BINARY_ADD:
        return a + b
    if op == C.BINARY_SUB:
        return a - b
    if op == C.BINARY_MUL:
        return a * b
    if op == C.BINARY_DIV:
        return a / b
    if op == C.BINARY_MAX:
        return jnp.maximum(a, b)
    if op == C.BINARY_MIN:
        return jnp.minimum(a, b)
    if op == C.BINARY_POW:
        return jnp.power(a, b)
    if op == C.BINARY_RSUB:
        return b - a
    if op == C.BINARY_RDIV:
        return b / a
    raise NotImplementedError(f"binary op {op}")


_UNARY = {
    C.UNARY_ABS: jnp.abs,
    C.UNARY_NEG: jnp.negative,
    C.UNARY_FLOOR: jnp.floor,
    C.UNARY_CEIL: jnp.ceil,
    C.UNARY_SQUARE: jnp.square,
    C.UNARY_SQRT: jnp.sqrt,
    C.UNARY_RSQRT: lax.rsqrt,
    C.UNARY_EXP: jnp.exp,
    C.UNARY_LOG: jnp.log,
    C.UNARY_SIN: jnp.sin,
    C.UNARY_COS: jnp.cos,
    C.UNARY_TAN: jnp.tan,
}


# ---------------------------------------------------------------------------
# layer table (executor-facing)
# ---------------------------------------------------------------------------

def _prelu_ch(y, slope):
    """Per-channel PReLU on NHWC (fused-activation code ACT_PRELU_CH)."""
    s = slope.astype(y.dtype).reshape((1,) * (y.ndim - 1) + (-1,))
    return jnp.where(y >= 0, y, y * s)


def _op_convolution(node, inputs, w: LayerWeights, ctx):
    _, k, dilation, stride, pad, _ = C.conv_hyperparams(node)
    x = inputs[0]
    hwio = ctx["w"][node.name]["hwio"]
    bias = ctx["w"][node.name]["bias"]
    act, params = C.activation_of(node)
    slope = (ctx["w"][node.name].get("slope")
             if act == C.ACT_PRELU_CH else None)
    if ctx.get("use_pallas_warp") and ctx.get("planar_escape"):
        # narrow-channel monsters (XLA lane-pads C to 128; see
        # BASELINE.md layout analysis) route via the planar Pallas kernel
        from . import planar_ops as P

        cin, cout = hwio.shape[2], hwio.shape[3]
        if (x.shape[1] * x.shape[2] >= 400_000
                and cin <= int(ctx.get("planar_escape_max_cin", 16))
                and act in P._ACT_MAP
                and P._planar_conv_ok(cin, cout, x.shape[1], x.shape[2],
                                      stride, k, dilation, pad)):
            from .conv_planar import conv_planar

            alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
            y = conv_planar(
                x.transpose(0, 1, 3, 2), hwio, bias, stride=stride,
                pad=pad, act=P._ACT_MAP[act], alpha=alpha, slope=slope,
            )
            return [y.transpose(0, 1, 3, 2)]
    y = conv2d(x, hwio, bias, stride=stride, pad=pad, dilation=dilation)
    if act == C.ACT_PRELU_CH:
        return [_prelu_ch(y, slope)]
    return [apply_activation(y, act, params)]


def _op_deconvolution(node, inputs, w, ctx):
    _, k, _, stride, pad, _ = C.conv_hyperparams(node)
    x = inputs[0]
    hwio = ctx["w"][node.name]["hwio"]
    bias = ctx["w"][node.name]["bias"]
    act, params = C.activation_of(node)
    slope = (ctx["w"][node.name].get("slope")
             if act == C.ACT_PRELU_CH else None)
    if ctx.get("use_pallas_warp") and ctx.get("planar_escape"):
        from . import planar_ops as P

        cin, cout = hwio.shape[2], hwio.shape[3]
        if (x.shape[1] * x.shape[2] >= 25_000
                and act in P._ACT_MAP
                and P._planar_deconv_ok(cin, cout, k, stride, pad)):
            from .conv_planar import deconv_planar

            alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
            y = deconv_planar(
                x.transpose(0, 1, 3, 2), hwio, bias,
                act=P._ACT_MAP[act], alpha=alpha, slope=slope,
            )
            return [y.transpose(0, 1, 3, 2)]
    y = deconv2d(x, hwio, bias, stride=stride, pad=pad)
    if act == C.ACT_PRELU_CH:
        return [_prelu_ch(y, slope)]
    return [apply_activation(y, act, params)]


def _op_innerproduct(node, inputs, w, ctx):
    x = inputs[0]  # (B, C)
    wt = ctx["w"][node.name]["dense"]  # (in, out)
    y = jnp.dot(
        x, wt.astype(x.dtype),
        preferred_element_type=jnp.float32,
        precision=_conv_precision(x),
    )
    y = y.astype(x.dtype)
    b = ctx["w"][node.name]["bias"]
    if b is not None:
        y = y + b.astype(y.dtype)
    act, params = C.activation_of(node)
    return [apply_activation(y, act, params)]


def _op_prelu(node, inputs, w, ctx):
    x = inputs[0]
    slope = ctx["w"][node.name]["slope"].astype(x.dtype)
    return [jnp.where(x >= 0, x, x * slope)]


def _op_relu(node, inputs, w, ctx):
    x = inputs[0]
    slope = float(node.p(0, 0.0))
    if slope == 0.0:
        return [jnp.maximum(x, 0)]
    if 0.0 < slope < 1.0 and os.environ.get("RIFE_TPU_LEAKY_MAX", "0") != "0":
        # max(x, s*x) == where(x>=0, x, s*x) exactly for 0<s<1 (s*x is the
        # same single rounding; for x<0, s*x > x; ties at +-0 are equal
        # values) — one VPU op instead of compare+select (A/B knob)
        return [jnp.maximum(x, x * jnp.asarray(slope, x.dtype))]
    return [jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))]


def _op_sigmoid(node, inputs, w, ctx):
    return [jax.nn.sigmoid(inputs[0])]


def _op_clip(node, inputs, w, ctx):
    return [jnp.clip(inputs[0], float(node.p(0)), float(node.p(1)))]


def _op_pooling(node, inputs, w, ctx):
    if int(node.p(4, 0)) != 1 or int(node.p(0, 0)) != 1:
        raise NotImplementedError("only global average pooling is used by the zoo")
    return [jnp.mean(inputs[0], axis=(1, 2))]  # (B,C)


def _op_interp(node, inputs, w, ctx):
    x = inputs[0]
    rtype, oh, ow = C.interp_out_size(x.shape[1], x.shape[2], node)
    method = {1: "nearest", 2: "bilinear"}[rtype]
    return [resize2d(x, oh, ow, method)]


def _op_concat(node, inputs, w, ctx):
    axis = C.chw_axis_to_nhwc(int(node.p(0, 0)), inputs[0].ndim)
    return [jnp.concatenate(inputs, axis=axis)]


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
    outs = []
    offset = 0
    for s in sizes:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(offset, offset + s)
        outs.append(x[tuple(idx)])
        offset += s
    return outs


def _op_split(node, inputs, w, ctx):
    return [inputs[0]] * len(node.tops)


def _op_binaryop(node, inputs, w, ctx):
    op = int(node.p(0, 0))
    if int(node.p(1, 0)) == 1:
        b = jnp.asarray(float(node.p(2, 0.0)), dtype=inputs[0].dtype)
        return [binary_op(op, inputs[0], b)]
    return [binary_op(op, inputs[0], inputs[1])]


def _op_unaryop(node, inputs, w, ctx):
    return [_UNARY[int(node.p(0, 0))](inputs[0])]


def _op_eltwise(node, inputs, w, ctx):
    if int(node.p(0, 0)) != 1:
        raise NotImplementedError("only Eltwise SUM is used by the zoo")
    coeffs = C.eltwise_coeffs(node, len(inputs))
    acc = inputs[0] * jnp.asarray(coeffs[0], inputs[0].dtype)
    for x, cf in zip(inputs[1:], coeffs[1:]):
        acc = acc + x * jnp.asarray(cf, x.dtype)
    return [acc]


def _op_pixelshuffle(node, inputs, w, ctx):
    return [pixel_shuffle(inputs[0], int(node.p(0, 1)))]


def _compact_taps4(x, axis):
    """Rows/cols {4i+1, 4i+2} of ``x`` along ``axis``, interleaved — the only
    pixels a half-pixel bilinear 1/4 downsample reads (``_downsample_axis``
    n=4 taps)."""
    size = x.shape[axis]

    def take(start):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(start, size, 4)
        return x[tuple(sl)]

    st = jnp.stack([take(1), take(2)], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = size // 2
    return st.reshape(shape)


def _warp_debug(node, path, image, ctx, **kw):
    """Trace-time visibility into warp routing (RIFE_TPU_WARP_DEBUG=1):
    which kernel each graph warp takes is the dominant perf variable."""
    if os.environ.get("RIFE_TPU_WARP_DEBUG", "0") != "0":
        print(f"[warp] {node.name}: {path} img={tuple(image.shape)} "
              f"{image.dtype} {kw}", flush=True)


def _op_warp_ds4(node, inputs, w, ctx):
    """Fused ``Interp(1/4, bilinear) ∘ rife.Warp`` (graph/rewrite.py R2).

    The v4-family flownet warps the full-resolution frames and immediately
    1/4-downscales them (/root/reference/models/rife-v4.6/flownet.param
    warp_0/warp_1 -> cat_3 -> upsample_12); the downsample reads only
    rows/cols {4i+1, 4i+2}, so half the warped pixels are dead.  This op
    evaluates the warp only on that compacted tap grid — absolute sample
    positions tap + flow[tap], bit-identical float math to the full-res warp
    at those pixels — then applies the identical 0.5/0.5 tap averages
    (h-axis first, then w, exactly ``resize2d``'s order).  Result is
    bit-exact vs warp-then-downscale with ~4x less gather work and no
    full-res warped tensor in HBM."""
    image, flow = inputs[0], inputs[1]
    h, wid = image.shape[1], image.shape[2]
    if h % 4 or wid % 4:  # padded canvases are 32-aligned; belt-and-braces
        y = _op_warp(node, inputs, w, ctx)[0]
        return [resize2d(y, int(round(h * 0.25)), int(round(wid * 0.25)))]
    sx, sy = _ds4_abs_positions(image, flow)
    ho, wo = sx.shape[1], sx.shape[2]

    if ctx.get("spatial_warp") is not None:
        u8 = _is_u8_warp(node.bottoms[0], image, ctx)
        _warp_debug(node, "spatial_ds4", image, ctx, u8=u8, out=(ho, wo))
        y = warp_spatial(image, sy, sx, ctx, u8=u8)
        return [_downsample_axis(_downsample_axis(y, 2, 1), 2, 2)]
    if ctx.get("use_pallas_warp"):
        from .warp_pallas import fits_vmem, warp_pallas

        u8 = _is_u8_warp(node.bottoms[0], image, ctx)
        # the u8 slab variant streams source bands at any size; the float
        # kernels stage the whole SOURCE plane in VMEM (output grid is
        # decoupled, so the residency bound is the source resolution)
        if u8 or fits_vmem(h, wid):
            _warp_debug(node, "pallas_ds4", image, ctx, u8=u8, abs_pos=True,
                        out=(ho, wo))
            pos = jnp.stack([sx, sy], axis=-1)
            y = warp_pallas(image, pos, u8_origin=u8, abs_pos=True)
        else:
            _warp_debug(node, "xla_ds4", image, ctx)
            y = warp_at(image, sy, sx)
    else:
        _warp_debug(node, "xla_ds4", image, ctx)
        y = warp_at(image, sy, sx)
    return [_downsample_axis(_downsample_axis(y, 2, 1), 2, 2)]


def _op_warp_ds2(node, inputs, w, ctx):
    """Fused ``Interp(1/2, bilinear) ∘ rife.Warp`` (graph/rewrite.py R2).

    Unlike the 1/4 case no warped pixel is dead — the 1/2 downsample
    averages every 2x2 block — so the gather work is unchanged; the win is
    structural: the Pallas ds2 kernel accumulates the four phase warps
    directly into the half-res output stripe, so the full-res warped tensor
    never reaches HBM and the separate resize pass disappears (the v4.6
    warp_2/warp_3 -> cat_7 -> upsample_15 pairs,
    /root/reference/models/rife-v4.6/flownet.param:110-114).  Bit-exact vs
    warp-then-``resize2d``: the kernel epilogue replays the unfused
    rounding (per-phase storage-dtype cast, then h/w 0.5-lerps in that
    dtype)."""
    image, flow = inputs[0], inputs[1]
    h, wid = image.shape[1], image.shape[2]
    if (not (h % 2 or wid % 2) and ctx.get("use_pallas_warp")
            and ctx.get("spatial_warp") is None):
        u8 = (
            not ctx.get("no_u8_warp")
            and image.shape[-1] <= 3
            and node.bottoms[0] in ctx.get("u8_image_blobs", ())
        )
        if u8:
            from .warp_pallas import warp_ds2_pallas

            _warp_debug(node, "pallas_ds2", image, ctx, u8=True)
            return [warp_ds2_pallas(image, flow)]
    # exact unfused composition (non-u8 images, odd sizes, XLA backend)
    y = _op_warp(node, inputs, w, ctx)[0]
    return [resize2d(y, int(round(h * 0.5)), int(round(wid * 0.5)))]


def _is_u8_warp(blob, image, ctx) -> bool:
    return (
        not ctx.get("no_u8_warp")
        and image.shape[-1] <= 3
        and blob in ctx.get("u8_image_blobs", ())
    )


def _op_warp(node, inputs, w, ctx):
    image, flow = inputs[0], inputs[1]
    if ctx.get("spatial_warp") is not None:
        h, wd = image.shape[1], image.shape[2]
        gy = lax.broadcasted_iota(jnp.float32, (h, wd), 0)
        gx = lax.broadcasted_iota(jnp.float32, (h, wd), 1)
        sx = gx[None] + flow[..., 0].astype(jnp.float32)
        sy = gy[None] + flow[..., 1].astype(jnp.float32)
        u8 = _is_u8_warp(node.bottoms[0], image, ctx)
        variant = ctx.get("warp_variant") or os.environ.get(
            "RIFE_TPU_WARP_VARIANT", "auto")
        _warp_debug(node, "spatial", image, ctx, u8=u8)
        return [warp_spatial(image, sy, sx, ctx, u8=u8, variant=variant)]
    if ctx.get("use_pallas_warp"):
        from .warp_pallas import fits_vmem, warp_pallas

        u8 = _is_u8_warp(node.bottoms[0], image, ctx)
        # u8-origin warps stream slabs at any size; the float kernels need
        # the whole plane resident in VMEM
        if u8 or fits_vmem(image.shape[1], image.shape[2]):
            variant = ctx.get("warp_variant") or os.environ.get(
                "RIFE_TPU_WARP_VARIANT", "auto")
            _warp_debug(node, "pallas", image, ctx, u8=u8, variant=variant)
            return [warp_pallas(image, flow, u8_origin=u8,
                                u8_variant=variant)]
    _warp_debug(node, "xla", image, ctx)
    return [warp(image, flow)]


def _pair_kernel_ok_base(ctx) -> bool:
    """Config gates for the fused two-warp pallas_call (warp_pallas_pair):
    Pallas on, no spatial sharding, the slab/tall/inflow variant selected,
    RIFE_TPU_WARP_PAIR not disabled.

    Rough-flow routing: the session's one-time auto probe
    (engine/session.py::_resolve_warp_variant) pins ``warp_variant='band'``
    into ctx for spatially-rough flows, which this gate rejects — paired
    warps then fall back to two single-warp lowerings that honor the band
    variant, the same routing as unpaired warps.  'auto' here therefore
    means "the probe classified the flow as smooth (or is disabled)", and
    the slab pair kernel is the right choice; RIFE_TPU_WARP_PAIR=0 is the
    manual escape hatch."""
    if os.environ.get("RIFE_TPU_WARP_PAIR", "1") == "0":
        return False
    if not ctx.get("use_pallas_warp") or ctx.get("spatial_warp") is not None:
        return False
    variant = ctx.get("warp_variant") or os.environ.get(
        "RIFE_TPU_WARP_VARIANT", "auto")
    if variant not in ("auto", "slab"):
        return False
    return not (
        os.environ.get("RIFE_TPU_WARP_U8_TALL", "1") == "0"
        or os.environ.get("RIFE_TPU_WARP_INFLOW", "1") == "0"
    )


def _pair_kernel_ok(node, img_a, img_b, flow_a, flow_b, ctx) -> bool:
    """Full gates: base config + both images u8-origin quad-eligible on
    the same grids.  Anything else falls back to two single-warp
    lowerings (identical semantics)."""
    return (
        _pair_kernel_ok_base(ctx)
        and img_a.shape == img_b.shape
        and flow_a.shape == flow_b.shape
        and _is_u8_warp(node.bottoms[0], img_a, ctx)
        and _is_u8_warp(node.bottoms[2], img_b, ctx)
    )


def _single_warp_node(node, half: int):
    """Shim LayerNode for one half of a pair node (fallback lowering)."""
    from ..graph.ir import LayerNode

    return LayerNode(
        "rife.Warp", f"{node.name}__half{half}",
        node.bottoms[2 * half : 2 * half + 2], node.tops[half : half + 1],
        {},
    )


def _op_warp_pair(node, inputs, w, ctx):
    """rife.WarpPair (graph/rewrite.py fuse_sibling_warps): the two
    frame warps of one refinement scale in a single pallas_call — one
    Mosaic grid walk and one scratch set instead of two (the per-cell
    fixed cost is ~40% of a smooth-flow warp's runtime, BASELINE.md).
    Reference sites: /root/reference/models/rife-v4.6/flownet.param
    warp_2/warp_3 and warp_4/warp_5 pairs."""
    img_a, flow_a, img_b, flow_b = inputs
    if _pair_kernel_ok(node, img_a, img_b, flow_a, flow_b, ctx):
        from .warp_pallas import warp_pallas_pair

        _warp_debug(node, "pallas_pair", img_a, ctx, u8=True)
        out_a, out_b = warp_pallas_pair(img_a, flow_a, img_b, flow_b)
        return [out_a, out_b]
    _warp_debug(node, "pair_fallback", img_a, ctx)
    return [
        _op_warp(_single_warp_node(node, 0), [img_a, flow_a], w, ctx)[0],
        _op_warp(_single_warp_node(node, 1), [img_b, flow_b], w, ctx)[0],
    ]


def _ds4_abs_positions(image, flow):
    """Absolute sample positions of the compacted 1/4-downsample tap grid
    (rows/cols {4i+1, 4i+2}) — shared by _op_warp_ds4 and the pair form."""
    h, wid = image.shape[1], image.shape[2]
    flow_c = _compact_taps4(_compact_taps4(flow, 1), 2)
    ho, wo = h // 2, wid // 2
    iy = lax.broadcasted_iota(jnp.int32, (ho, wo), 0)
    ix = lax.broadcasted_iota(jnp.int32, (ho, wo), 1)
    gy = ((iy // 2) * 4 + 1 + (iy % 2)).astype(jnp.float32)
    gx = ((ix // 2) * 4 + 1 + (ix % 2)).astype(jnp.float32)
    sx = gx[None] + flow_c[..., 0].astype(jnp.float32)
    sy = gy[None] + flow_c[..., 1].astype(jnp.float32)
    return sx, sy


def _op_warp_ds4_pair(node, inputs, w, ctx):
    """rife.WarpDs4Pair: both fused warp-then-1/4-downscale taps of a
    block entry in one pallas_call (see _op_warp_ds4 for the tap-grid
    algebra and _op_warp_pair for why pairing pays)."""
    img_a, flow_a, img_b, flow_b = inputs
    h, wid = img_a.shape[1], img_a.shape[2]
    if (h % 4 == 0 and wid % 4 == 0
            and _pair_kernel_ok(node, img_a, img_b, flow_a, flow_b, ctx)):
        if os.environ.get("RIFE_TPU_WARP_DS4_SHEARED", "0") != "0":
            # sheared phase-split core emitting the FINAL 1/4-res planes.
            # Bit-exact but MEASURED NET-NEGATIVE (tools/warp_ds4_ab.py,
            # B=24 1080p: 175 vs 49 ms smooth, 329 vs 144 ms iid): the
            # stride-4 tap grid forces ~4 taps x ~5 source tiles x ~6 dy
            # values of fori_loop scalar overhead per stripe, where the
            # tall one-hot core serves 8 candidate rows per visit.  Kept
            # behind this env as a documented negative (BASELINE.md r5).
            from .warp_pallas import warp_pallas_ds4_pair

            _warp_debug(node, "pallas_ds4_pair_sheared", img_a, ctx,
                        u8=True, out=(h // 4, wid // 4))
            y_a, y_b = warp_pallas_ds4_pair(img_a, flow_a, img_b, flow_b)
            return [y_a, y_b]
        from .warp_pallas import warp_pallas_pair

        sxa, sya = _ds4_abs_positions(img_a, flow_a)
        sxb, syb = _ds4_abs_positions(img_b, flow_b)
        _warp_debug(node, "pallas_ds4_pair", img_a, ctx, u8=True,
                    out=sxa.shape[1:])
        y_a, y_b = warp_pallas_pair(
            img_a, jnp.stack([sxa, sya], axis=-1),
            img_b, jnp.stack([sxb, syb], axis=-1), abs_pos=True)
        return [
            _downsample_axis(_downsample_axis(y_a, 2, 1), 2, 2),
            _downsample_axis(_downsample_axis(y_b, 2, 1), 2, 2),
        ]
    _warp_debug(node, "ds4_pair_fallback", img_a, ctx)

    def half(i, img, fl):
        from ..graph.ir import LayerNode

        shim = LayerNode("rife.WarpDs4", f"{node.name}__half{i}",
                         node.bottoms[2 * i : 2 * i + 2],
                         node.tops[i : i + 1], {})
        return _op_warp_ds4(shim, [img, fl], w, ctx)[0]

    return [half(0, img_a, flow_a), half(1, img_b, flow_b)]


def _render_warp(img, fl, blob, node, ctx):
    """One render warp: Pallas-routed exactly like _op_warp, but keyed on
    an explicit image blob name (the fused node carries two images)."""
    if ctx.get("spatial_warp") is not None:
        h, wd = img.shape[1], img.shape[2]
        gy = lax.broadcasted_iota(jnp.float32, (h, wd), 0)
        gx = lax.broadcasted_iota(jnp.float32, (h, wd), 1)
        sx = gx[None] + fl[..., 0].astype(jnp.float32)
        sy = gy[None] + fl[..., 1].astype(jnp.float32)
        u8 = _is_u8_warp(blob, img, ctx)
        variant = ctx.get("warp_variant") or os.environ.get(
            "RIFE_TPU_WARP_VARIANT", "auto")
        _warp_debug(node, "spatial_render", img, ctx, u8=u8)
        return warp_spatial(img, sy, sx, ctx, u8=u8, variant=variant)
    if ctx.get("use_pallas_warp"):
        from .warp_pallas import fits_vmem, warp_pallas

        u8 = _is_u8_warp(blob, img, ctx)
        if u8 or fits_vmem(img.shape[1], img.shape[2]):
            variant = ctx.get("warp_variant") or os.environ.get(
                "RIFE_TPU_WARP_VARIANT", "auto")
            _warp_debug(node, "pallas_render", img, ctx, u8=u8,
                        variant=variant)
            return warp_pallas(img, fl, u8_origin=u8, u8_variant=variant)
    _warp_debug(node, "xla_render", img, ctx)
    return warp(img, fl)


def _op_render_blend(node, inputs, w, ctx):
    """rife.RenderBlend (graph/rewrite.py fuse_render_blend): the final
    render — ``warp(img_m, flow_m)*mask + warp(img_inv, flow_inv)*(1-mask)``
    — as one op.  With the Pallas u8 warp the warped images stay per-channel
    PLANES (B,H,C,W) and the blend runs on planes, so no lane-padded C=3
    full-res NHWC tensor ever materializes (XLA pads C to 128 lanes: the
    unfused blend+postprocess measured ~44 ms of the 506 ms B=24 1080p
    v4.6 step beyond the warps' own cost).  The blend algebra (same dtype,
    same operand order) is bit-identical to the composed ops — elementwise
    math is layout-independent.

    Emits planes when the blob is listed in ctx['planar_outputs'] (the v4
    pipeline then finishes with frame.postprocess_planar), NHWC otherwise
    (TTA paths merge views on NHWC).
    Reference tail: /root/reference/models/rife-v4.6/flownet.param:208-217;
    blend shader /root/reference/src/rife.cpp render pass."""
    img_m, flow_m, img_inv, flow_inv, mask = inputs
    planar_out = node.tops[0] in ctx.get("planar_outputs", ())
    u8_ok = (
        not ctx.get("no_u8_warp")
        and img_m.shape[-1] <= 3
        and img_inv.shape[-1] <= 3
        and node.bottoms[0] in ctx.get("u8_image_blobs", ())
        and node.bottoms[2] in ctx.get("u8_image_blobs", ())
    )
    if ctx.get("use_pallas_warp") and u8_ok:
        from .warp_pallas import warp_pallas, warp_pallas_pair

        if _pair_kernel_ok(node, img_m, img_inv, flow_m, flow_inv, ctx):
            # one pallas_call: both warps + the mask blend in-kernel —
            # only the 3 blended planes ever reach HBM (the composed form
            # writes 6 warped planes and reads them back for the blend)
            _warp_debug(node, "pallas_render_fused", img_m, ctx, u8=True)
            out = warp_pallas_pair(
                img_m, flow_m, img_inv, flow_inv,
                mask[..., 0], blend=True, planar_out=True)
            if planar_out:
                return [out]
            return [out.transpose(0, 1, 3, 2)]
        variant = ctx.get("warp_variant") or os.environ.get(
                "RIFE_TPU_WARP_VARIANT", "auto")
        _warp_debug(node, "pallas_render_planar", img_m, ctx, u8=True,
                    variant=variant)
        wm = warp_pallas(img_m, flow_m, u8_origin=True, u8_variant=variant,
                         planar_out=True)
        wi = warp_pallas(img_inv, flow_inv, u8_origin=True,
                         u8_variant=variant, planar_out=True)
        m = mask.transpose(0, 1, 3, 2)  # (B,H,W,1) -> (B,H,1,W) plane
        one = jnp.asarray(1.0, m.dtype)
        out = wm * m + wi * (one - m)
        if planar_out:
            return [out]
        return [out.transpose(0, 1, 3, 2)]
    # exact composed fallback (XLA warp / non-u8 images)
    wm = _render_warp(img_m, flow_m, node.bottoms[0], node, ctx)
    wi = _render_warp(img_inv, flow_inv, node.bottoms[2], node, ctx)
    one = jnp.asarray(1.0, mask.dtype)
    out = wm * mask + wi * (one - mask)
    if planar_out:
        return [out.transpose(0, 1, 3, 2)]
    return [out]


def _op_convolution_cat(node, inputs, w, ctx):
    """ConvolutionCat (graph/rewrite.py fuse_concat_into_convs): on the
    NHWC path the concat is re-materialized — identical semantics; the
    planar table feeds the parts straight into the kernel's band slots."""
    return _op_convolution(node, [jnp.concatenate(inputs, axis=3)], w, ctx)


def _op_warp_cat_conv(node, inputs, w, ctx):
    """rife.WarpCatConv (graph/rewrite.py fuse_warps_into_cat_conv): the
    block-entry warps + concat + stride-2 conv as one op.

    Fast path (Pallas warp on, all warp parts u8-eligible, the direct-s2
    planar kernel gates pass): the warps emit per-channel PLANES, narrow
    non-warp parts transpose to planes (C=1 parts are free reshapes), and
    everything DMAs straight into the planar conv kernel's band slots —
    the warped images and the 12-ch concat never materialize in NHWC
    (33.2 ms of the B=24 1080p step for block3's entry, vs ~16 ms for the
    planar kernel).  The conv accumulates in f32 like the XLA conv; the
    two paths differ only in accumulation order (<=1 bf16 ulp).
    Fallback: exactly the composed warp + concat + conv.
    Reference: /root/reference/models/rife-v4.6/flownet.param:164-166."""
    flags = node.p(26)
    specs = []  # (is_warp, img_or_part, flow_or_None, image_blob)
    pos = 0
    for f in flags:
        if f:
            specs.append((True, inputs[pos], inputs[pos + 1],
                          node.bottoms[pos]))
            pos += 2
        else:
            specs.append((False, inputs[pos], None, node.bottoms[pos]))
            pos += 1

    from . import planar_ops as P

    hw = ctx["w"][node.name]["hwio"]
    cin, cout = hw.shape[2], hw.shape[3]
    h, wid = specs[0][1].shape[1], specs[0][1].shape[2]
    u8s = ctx.get("u8_image_blobs", ())
    u8_ok = not ctx.get("no_u8_warp") and all(
        (not is_warp) or (img.shape[-1] <= 3 and blob in u8s)
        for is_warp, img, _, blob in specs
    )
    if (ctx.get("use_pallas_warp") and u8_ok
            and int(node.p(3, 1)) == 2
            and os.environ.get("RIFE_TPU_S2_DIRECT", "1") != "0"
            and os.environ.get("RIFE_TPU_FUSE_WARPCAT", "1") != "0"
            and P.conv_wants_planar(node, h, wid, cin, cout, ctx)):
        from .conv_planar import conv_planar_cat
        from .warp_pallas import warp_pallas

        variant = ctx.get("warp_variant") or os.environ.get(
                "RIFE_TPU_WARP_VARIANT", "auto")
        parts = []
        for is_warp, x, fl, blob in specs:
            if is_warp:
                _warp_debug(node, "pallas_warpcat", x, ctx, u8=True,
                            variant=variant)
                parts.append(warp_pallas(x, fl, u8_origin=True,
                                         u8_variant=variant,
                                         planar_out=True))
            else:
                parts.append(x.transpose(0, 1, 3, 2))  # NHWC -> BHCW
        act, params = C.activation_of(node)
        bias = ctx["w"][node.name]["bias"]
        slope = (ctx["w"][node.name].get("slope")
                 if act == C.ACT_PRELU_CH else None)
        alpha = float(params[0]) if act == C.ACT_LEAKY else 0.2
        y = conv_planar_cat(parts, hw, bias, act=P._ACT_MAP[act],
                            alpha=alpha, slope=slope)
        return [y.transpose(0, 1, 3, 2)]  # BHCW -> NHWC
    # exact composed fallback
    vals = [
        _render_warp(x, fl, blob, node, ctx) if is_warp else x
        for is_warp, x, fl, blob in specs
    ]
    return _op_convolution(node, [jnp.concatenate(vals, axis=3)], w, ctx)


def _op_conv_ps(node, inputs, w, ctx):
    """rife.ConvPS / rife.DeconvPS (graph/rewrite.py
    fuse_pixelshuffle_into_convs): on the NHWC path the fusion buys nothing,
    so just compose the two ops — identical semantics; the planar table
    bakes the shuffle into the conv's output-channel order."""
    op = (_op_deconvolution if node.type == "rife.DeconvPS"
          else _op_convolution)
    return [pixel_shuffle(op(node, inputs, w, ctx)[0], int(node.p(25, 2)))]


OP_TABLE = {
    "Convolution": _op_convolution,
    "ConvolutionCat": _op_convolution_cat,
    "Deconvolution": _op_deconvolution,
    "InnerProduct": _op_innerproduct,
    "PReLU": _op_prelu,
    "ReLU": _op_relu,
    "Sigmoid": _op_sigmoid,
    "Clip": _op_clip,
    "Pooling": _op_pooling,
    "Interp": _op_interp,
    "Concat": _op_concat,
    "Crop": _op_crop,
    "Slice": _op_slice,
    "Split": _op_split,
    "BinaryOp": _op_binaryop,
    "UnaryOp": _op_unaryop,
    "Eltwise": _op_eltwise,
    "PixelShuffle": _op_pixelshuffle,
    "rife.ConvPS": _op_conv_ps,
    "rife.DeconvPS": _op_conv_ps,
    "rife.Warp": _op_warp,
    "rife.WarpPair": _op_warp_pair,
    "rife.WarpDs4": _op_warp_ds4,
    "rife.WarpDs4Pair": _op_warp_ds4_pair,
    "rife.WarpDs2": _op_warp_ds2,
    "rife.RenderBlend": _op_render_blend,
    "rife.WarpCatConv": _op_warp_cat_conv,
}


# ---------------------------------------------------------------------------
# weight pytree preparation (layout transforms done once, outside jit)
# ---------------------------------------------------------------------------

def prepare_weights(
    graph, raw: Dict[str, LayerWeights], dtype=jnp.float32
) -> Dict[str, Dict[str, Optional[jnp.ndarray]]]:
    """Convert ncnn-layout numpy arrays to TPU-friendly layouts.

    Convolution (O,I,kh,kw) -> HWIO; Deconvolution (I,O,kh,kw) -> spatially
    flipped HWIO (ready for the lhs-dilated conv in :func:`deconv2d`);
    InnerProduct (O,I) -> (I,O).
    """
    out: Dict[str, Dict[str, Optional[jnp.ndarray]]] = {}
    for node in graph.nodes:
        lw = raw.get(node.name)
        if lw is None:
            continue
        entry: Dict[str, Optional[jnp.ndarray]] = {}
        if node.type in ("Convolution", "ConvolutionCat", "rife.ConvPS",
                         "rife.WarpCatConv"):
            entry["hwio"] = jnp.asarray(
                lw.weight.transpose(2, 3, 1, 0), dtype=dtype
            )
            entry["bias"] = (
                None if lw.bias is None else jnp.asarray(lw.bias, dtype=jnp.float32)
            )
            if lw.slope is not None:  # fused PReLU (ACT_PRELU_CH)
                entry["slope"] = jnp.asarray(lw.slope, dtype=jnp.float32)
        elif node.type in ("Deconvolution", "rife.DeconvPS"):
            w = lw.weight[:, :, ::-1, ::-1]  # flip spatial taps
            entry["hwio"] = jnp.asarray(w.transpose(2, 3, 0, 1), dtype=dtype)
            if lw.slope is not None:  # fused PReLU (ACT_PRELU_CH)
                entry["slope"] = jnp.asarray(lw.slope, dtype=jnp.float32)
            entry["bias"] = (
                None if lw.bias is None else jnp.asarray(lw.bias, dtype=jnp.float32)
            )
        elif node.type == "InnerProduct":
            entry["dense"] = jnp.asarray(lw.weight.T, dtype=dtype)
            entry["bias"] = (
                None if lw.bias is None else jnp.asarray(lw.bias, dtype=jnp.float32)
            )
        elif node.type == "PReLU":
            entry["slope"] = jnp.asarray(lw.slope, dtype=jnp.float32)
        out[node.name] = entry
    return out
