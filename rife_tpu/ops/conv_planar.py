"""Planar (NCHW) Pallas conv kernel for narrow-channel layers.

Why: XLA:TPU stores conv operands feature-minor and lane-pads C to 128.
For the zoo's narrow layers that is catastrophic HBM bloat — measured on
v5e at B=24 bf16 (tools/conv_chain.py, tools/nchw_exp.py):

  * 3x3 s2 12->32 @1088x1920 (v4 IFBlock encoder,
    /root/reference/models/rife-v4.6/flownet.param:166 convrelu_6):
    35.8 ms/conv — the 12ch input alone is stored 10.7x padded (12.8 GB).
  * 3x3 C=32 @540x960: 26 ms/conv (8.7 TF/s); C=24: 17 ms.  NCHW dimension
    numbers do NOT help (35.1 ms) — XLA relayouts to the same padded form.

This kernel keeps activations as planes (B, C, H, W) — W on lanes, ZERO
padding waste at any C — and runs the conv as an MXU GEMM oriented
out-channels x pixels:

    out[co, x] = sum_k  Wmat[co, k] * A[k, x]      k = (tap, cin)

Per grid cell (batch b, TH=8 output rows): DMA the input band
(Cin, TH+kh-1, Wp) into VMEM; for each output row build the im2col
A-matrix (K', Wo_pad) from kh*kw shifted row-slices (K' = taps *
round_up(Cin, 8), sublane-aligned per tap); one dot (Cout, K') @ (K',
Wo_pad) with f32 accumulation; add bias, apply the fused activation, and
write the (Cout, Wo_pad) row plane.

Stride 2 is handled outside the kernel: ``planar_s2d`` splits x into 2x2
phase planes ((B, 4*Cin, H/2, W/2), exact relayout) and the 3x3 s2 kernel
is remapped to an equivalent 2x2 s1 kernel over the phase planes
(``_remap_s2_weights``) — the kernel itself is stride-1 only.

Zero padding (conv pad p) is baked into the host-side plane padding, so
edge semantics match ``jax_ops.conv2d`` exactly; outputs are cropped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TH = 8  # output rows per grid cell


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# activation codes (static)
ACT_NONE, ACT_RELU, ACT_LEAKY, ACT_PRELU = 0, 1, 2, 3


def _conv_planar_kernel(x_hbm, w_ref, b_ref, s_ref, o_ref, band, sem, *,
                        cin: int, cout: int, kh: int, kw: int,
                        wo_pad: int, act: int, alpha: float):
    # x_hbm is (B, hp, Cin, Wp) — rows major of channels, so each tap
    # operand band[row] is a contiguous (Cin, Wp) slab with channels on
    # sublanes, directly consumable by the MXU dot (no im2col transpose).
    i = pl.program_id(0)
    j = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * TH, TH + kh - 1)], band, sem
    )
    cp.start()
    cp.wait()

    for r in range(TH):
        acc = None
        for t in range(kh * kw):
            ky, kx = divmod(t, kw)
            d = jax.lax.dot_general(
                w_ref[t], band[r + ky, :, pl.ds(kx, wo_pad)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        acc = acc + b_ref[:]
        if act == ACT_RELU:
            acc = jnp.maximum(acc, 0.0)
        elif act == ACT_LEAKY:
            acc = jnp.where(acc >= 0, acc, acc * alpha)
        elif act == ACT_PRELU:
            acc = jnp.where(acc >= 0, acc, acc * s_ref[:])
        o_ref[0, 0, r] = acc.astype(o_ref.dtype)


def conv_planar_bhcw(xp, wmat, bias, *, kh, kw, out_h, act=ACT_NONE,
                     alpha=0.2, slope=None):
    """Raw kernel entry: BHCW in, BHCW out (both padded).

    ``xp`` is (B, hp, Cin, Wp) — conv zero-padding already baked in (data
    at rows/cols [pad, ...), hp >= round_up(out_h, TH) + kh - 1, Wp >=
    round_up(out_w, 128) + kw - 1).  Returns (B, round_up(out_h, TH),
    Cout, Wp - 128); callers crop rows/cols.  ``wmat`` (kh*kw, Cout, Cin).
    """
    b, hp, cin, wp = xp.shape
    assert cin % TH == 0, "BHCW channel dim must be 8-aligned (zero-pad)"
    cout = wmat.shape[1]
    wo_pad = wp - LANE
    n_h = _round_up(out_h, TH) // TH
    if slope is None:
        slope = jnp.zeros((cout, 1), jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _conv_planar_kernel, cin=cin, cout=cout, kh=kh, kw=kw,
            wo_pad=wo_pad, act=act, alpha=alpha,
        ),
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kh * kw, cout, cin), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TH, cout, wo_pad), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_h, TH, cout, wo_pad), xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + kh - 1, cin, wp), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, wmat, bias, slope)

    return out.reshape(b, n_h * TH, cout, wo_pad)


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "pad", "act", "alpha", "out_h", "out_w"),
)
def _conv_planar_s1(x, wmat, bias, *, kh, kw, pad, act, alpha,
                    out_h, out_w, slope=None):
    """x (B, Cin, H, W) -> (B, Cout, out_h, out_w); stride 1."""
    b, cin, h, w = x.shape
    wo_pad = _round_up(out_w, LANE)
    wp = wo_pad + LANE
    hp = _round_up(out_h, TH) + kh - 1
    # bake conv zero-padding into the plane: data at rows/cols [pad, ...);
    # channels zero-padded to the 8-sublane tile (DMA slice alignment);
    # then go BHCW so each row is a contiguous (Cin, Wp) channel slab
    xp = jnp.pad(
        x, ((0, 0), (0, _round_up(cin, TH) - cin),
            (pad, hp - h - pad), (pad, wp - w - pad))
    ).transpose(0, 2, 1, 3)
    out = conv_planar_bhcw(xp, wmat, bias, kh=kh, kw=kw, out_h=out_h,
                           act=act, alpha=alpha, slope=slope)
    return out[:, :out_h, :, :out_w].transpose(0, 2, 1, 3)


def pack_weights(w_hwio, cin, dtype=jnp.bfloat16):
    """(kh,kw,Cin,Cout) -> (kh*kw, Cout, round_up(Cin,8)) per-tap lhs.

    Cin is zero-padded to the sublane tile: the BHCW channel dim is
    second-minor in HBM, and DMA slices along it must be 8-aligned."""
    kh, kw, ci, co = w_hwio.shape
    wm = w_hwio.astype(dtype).reshape(kh * kw, ci, co).transpose(0, 2, 1)
    cp = _round_up(ci, TH)
    if cp != ci:
        wm = jnp.pad(wm, ((0, 0), (0, 0), (0, cp - ci)))
    return wm


def planar_s2d(x):
    """(B, C, H, W) -> (B, C*4, H/2, W/2), phase order (c, py, px)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * 4, h // 2, w // 2)


def _remap_s2_weights(w_hwio):
    """3x3 stride-2 pad-1 kernel -> equivalent 2x2 stride-1 kernel over
    ``planar_s2d`` phase planes (channel order (c, py, px)).

    orig input row for output y' and tap ky is 2y'+ky-1 = 2*(y'+sy)+py with
    py=(ky-1)%2, sy=(ky-1-py)//2; new tap a=sy+1 in {0,1}.  Same for cols.
    """
    kh, kw, ci, co = w_hwio.shape
    assert kh == 3 and kw == 3
    wn = jnp.zeros((2, 2, ci * 4, co), w_hwio.dtype)
    for ky in range(3):
        r = ky - 1
        py = r % 2
        a = (r - py) // 2 + 1
        for kx in range(3):
            c_ = kx - 1
            px = c_ % 2
            bb = (c_ - px) // 2 + 1
            wn = wn.at[a, bb, py * 2 + px :: 4, :].set(w_hwio[ky, kx])
    return wn


def conv_planar(x, w_hwio, bias=None, *, stride=1, pad=1,
                act=ACT_NONE, alpha=0.2, slope=None):
    """NCHW conv via the planar Pallas kernel.

    x (B, Cin, H, W); w (kh, kw, Cin, Cout) as in jax_ops.conv2d; stride
    1 or 2 (stride 2 requires kh=kw=3, pad=1 — the zoo's only s2 shape).
    ``slope`` (Cout,) enables fused per-channel PReLU when act=ACT_PRELU.
    Returns (B, Cout, Hout, Wout).
    """
    b, cin, h, w = x.shape
    kh, kw, _, cout = w_hwio.shape
    bb = (jnp.zeros((cout, 1), jnp.float32) if bias is None
          else bias.reshape(cout, 1).astype(jnp.float32))
    sl = None if slope is None else slope.reshape(cout, 1).astype(jnp.float32)
    wdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    if stride == 2:
        # 3x3 s2 p1 == 2x2 s1 p1 over 2x2 phase planes, cropped to H/2 x W/2
        # (the 2x2 phase kernel reads plane rows/cols {i-1, i})
        assert (kh, kw, pad) == (3, 3, 1) and h % 2 == 0 and w % 2 == 0
        xs = planar_s2d(x)
        wm = pack_weights(_remap_s2_weights(w_hwio), cin * 4, wdt)
        return _conv_planar_s1(
            xs, wm, bb, kh=2, kw=2, pad=1, act=act, alpha=alpha,
            out_h=h // 2, out_w=w // 2, slope=sl,
        )
    assert stride == 1
    out_h = h + 2 * pad - (kh - 1)
    out_w = w + 2 * pad - (kw - 1)
    wm = pack_weights(w_hwio, cin, wdt)
    return _conv_planar_s1(
        x, wm, bb, kh=kh, kw=kw, pad=pad, act=act, alpha=alpha,
        out_h=out_h, out_w=out_w, slope=sl,
    )


def _deconv_phase_weights(wf):
    """ConvTranspose 4x4 s2 p1 (as the spatially-flipped HWIO kernel fed to
    ``jax_ops.deconv2d``) -> one 3x3 s1 p1 kernel producing all four output
    phases stacked on out-channels (phase (py,px) major).

    deconv2d computes out[o] = sum_t xd[o-2+t]*wf[t] over the 2x-dilated
    input; per parity that collapses to 2 taps: even o=2m: (wf0 @ x[m-1],
    wf2 @ x[m]); odd o=2m+1: (wf1 @ x[m], wf3 @ x[m+1]).  Expressed on the
    common 3-tap window (x[m-1], x[m], x[m+1]): even=(wf0, wf2, 0),
    odd=(0, wf1, wf3) — per axis, outer product over (ky, kx)."""
    _, _, ci, co = wf.shape
    taps = {0: {0: 0, 1: 2}, 1: {1: 1, 2: 3}}  # parity -> {3tap: wf tap}
    w3 = jnp.zeros((3, 3, ci, 4 * co), wf.dtype)
    for py, rmap in taps.items():
        for px, cmap in taps.items():
            blk = slice((py * 2 + px) * co, (py * 2 + px + 1) * co)
            for ry, a in rmap.items():
                for rx, bb in cmap.items():
                    w3 = w3.at[ry, rx, :, blk].set(wf[a, bb])
    return w3


def deconv_planar(x, w_hwio_flipped, bias=None, *, act=ACT_NONE,
                  alpha=0.2, slope=None):
    """NCHW ConvTranspose 4x4 s2 p1 via one planar conv producing the four
    output phases, then a phase interleave.  Matches ``jax_ops.deconv2d``
    (same spatially-flipped HWIO weight layout)."""
    b, cin, h, w = x.shape
    co = w_hwio_flipped.shape[-1]
    w3 = _deconv_phase_weights(w_hwio_flipped)
    bb = None if bias is None else jnp.tile(bias.reshape(co), 4)
    sl = None if slope is None else jnp.tile(slope.reshape(co), 4)
    y4 = conv_planar(x, w3, bb, stride=1, pad=1, act=act, alpha=alpha,
                     slope=sl)
    y = y4.reshape(b, 2, 2, co, h, w).transpose(0, 3, 4, 1, 5, 2)
    return y.reshape(b, co, 2 * h, 2 * w)


def conv_planar_ref(x, w_hwio, bias=None, *, stride=1, pad=1,
                    act=ACT_NONE, alpha=0.2):
    """XLA reference with identical semantics (NCHW in/out)."""
    from jax import lax

    y = lax.conv_general_dilated(
        x, w_hwio.astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.reshape(1, -1, 1, 1).astype(y.dtype)
    if act == ACT_RELU:
        y = jnp.maximum(y, 0.0)
    elif act == ACT_LEAKY:
        y = jnp.where(y >= 0, y, y * alpha)
    return y.astype(x.dtype)
