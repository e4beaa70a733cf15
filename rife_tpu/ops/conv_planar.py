"""Planar (BHCW) Pallas conv kernels for narrow-channel layers.

Why: XLA:TPU stores conv operands feature-minor and lane-pads C to 128.
For the zoo's narrow layers that is catastrophic HBM bloat — measured on
v5e at B=24 bf16 (tools/conv_chain.py, tools/planar_inprog.py):

  * 3x3 s2 12->32 @1088x1920 (v4 IFBlock encoder,
    /root/reference/models/rife-v4.6/flownet.param:166 convrelu_6):
    44.1 ms/conv in-program — the 12ch input alone is stored 10.7x padded.
  * the same conv on this kernel: 10.1 ms from its native layout, and any
    HBM relayout to reach a different layout costs 8-38 ms — which is why
    the region executor CARRIES activations as (B, H, C, W): each row is a
    contiguous (C, W) channel slab, directly consumable by the MXU dot,
    and the stride-2 H-phase split is a FREE reshape.

Two kernels:

* ``conv_planar_bhcw`` — stride 1: per grid cell (batch b, TH=8 output
  rows) DMA the (TH+kh-1, Cin, Wp) input band; per output row accumulate
  kh*kw MXU dots ``W[t] (Cout, Cin) @ band[r+ky, :, kx:kx+Wo]`` with f32
  accumulation, fused bias + activation, write the (Cout, Wo) row slab.
* ``conv_s2_bhcw`` — stride 2 (3x3 pad 1): input is the free H-phase
  reshape (B, H/2, 2*Cin, W) with W still INTERLEAVED.  Every tap kx,
  sliced at ds(kx), lands output column x' at rhs column 2x'+1, so the 6
  (H-phase, kx) dots run on a double-width rhs (negligible at these sizes)
  and one odd-column extraction per small output row replaces any
  deinterleave of the wider input (Mosaic cannot lane-stride-slice).

Zero padding (conv pad p) is baked into the host-side plane padding, so
edge semantics match ``jax_ops.conv2d`` exactly; outputs are cropped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TH = 8  # output rows per grid cell


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# activation codes (static)
ACT_NONE, ACT_RELU, ACT_LEAKY, ACT_PRELU = 0, 1, 2, 3


def _apply_act(acc, act, alpha, s_ref):
    if act == ACT_RELU:
        return jnp.maximum(acc, 0.0)
    if act == ACT_LEAKY:
        return jnp.where(acc >= 0, acc, acc * alpha)
    if act == ACT_PRELU:
        return jnp.where(acc >= 0, acc, acc * s_ref[:])
    return acc


def _conv_planar_kernel(x_hbm, w_ref, b_ref, s_ref, o_ref, band, sem, *,
                        cin: int, cout: int, kh: int, kw: int,
                        wo_pad: int, act: int, alpha: float,
                        precision):
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
                precision=precision,
            )
            acc = d if acc is None else acc + d
        acc = _apply_act(acc + b_ref[:], act, alpha, s_ref)
        o_ref[0, 0, r] = acc.astype(o_ref.dtype)


def conv_planar_bhcw(xp, wmat, bias, *, kh, kw, out_h, act=ACT_NONE,
                     alpha=0.2, slope=None):
    """Raw stride-1 kernel entry: BHCW in, BHCW out (both padded).

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

    # f32 activations ask for true-f32 MXU passes (the TPU default for a
    # plain dot is a single bf16 pass: ~1e-2 absolute error on flow-scale
    # values); bf16 runs native
    precision = (lax.Precision.HIGHEST if xp.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    out = pl.pallas_call(
        functools.partial(
            _conv_planar_kernel, cin=cin, cout=cout, kh=kh, kw=kw,
            wo_pad=wo_pad, act=act, alpha=alpha, precision=precision,
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


def _conv_s2_kernel(x_hbm, w_ref, b_ref, s_ref, o_ref, band, sem, *,
                    c2: int, cout: int, wo_pad: int, act: int, alpha: float,
                    precision):
    """Stride-2 via H phases on channels + interleaved-W GEMM (see module
    docstring): taps align at output column 2x'+1, extracted per row."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[i, pl.ds(j * TH, TH + 1)], band, sem)
    cp.start()
    cp.wait()

    w2 = 2 * wo_pad
    jj = lax.broadcasted_iota(jnp.int32, (cout, LANE), 1)
    idx_a = jnp.minimum(2 * jj + 1, LANE - 1)
    idx_b = jnp.maximum(2 * jj + 1 - LANE, 0)
    sel_a = (2 * jj + 1) < LANE

    for r in range(TH):
        acc = None
        for t in range(6):  # (H-phase a, kx) taps
            a, kx = divmod(t, 3)
            d = lax.dot_general(
                w_ref[t], band[r + a, :, pl.ds(kx, w2)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            acc = d if acc is None else acc + d
        acc = _apply_act(acc + b_ref[:], act, alpha, s_ref)
        # odd columns of acc (cout, 2*wo_pad) -> (cout, wo_pad)
        for ot in range(wo_pad // LANE):
            src_a = acc[:, 2 * ot * LANE : (2 * ot + 1) * LANE]
            src_b = acc[:, (2 * ot + 1) * LANE : (2 * ot + 2) * LANE]
            ga = jnp.take_along_axis(src_a, idx_a, axis=1)
            gb = jnp.take_along_axis(src_b, idx_b, axis=1)
            o_ref[0, 0, r, :, pl.ds(ot * LANE, LANE)] = jnp.where(
                sel_a, ga, gb
            ).astype(o_ref.dtype)


def conv_s2_bhcw(xs, wmat, bias, out_h, *, act=ACT_NONE, alpha=0.2,
                 slope=None):
    """Raw stride-2 kernel entry.

    ``xs`` (B, hp2, C2p, Wpf): the free H-phase reshape of a BHCW tensor
    padded so rows/cols sit at [2, ...) (the first split row / even-odd
    column pair are the phase-plane pad slots).  ``wmat`` (6, Cout, C2p)
    from :func:`pack_s2_weights`.  Returns (B, n_h*TH, Cout, wo_pad).
    """
    b, hp2, c2, wpf = xs.shape
    cout = wmat.shape[1]
    wo_pad = (wpf - LANE) // 2
    n_h = _round_up(out_h, TH) // TH
    if slope is None:
        slope = jnp.zeros((cout, 1), jnp.float32)
    precision = (lax.Precision.HIGHEST if xs.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    out = pl.pallas_call(
        functools.partial(_conv_s2_kernel, c2=c2, cout=cout, wo_pad=wo_pad,
                          act=act, alpha=alpha, precision=precision),
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, cout, c2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TH, cout, wo_pad),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_h, TH, cout, wo_pad), xs.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 1, c2, wpf), xs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xs, wmat, bias, slope)
    return out.reshape(b, n_h * TH, cout, wo_pad)


def _conv_s1_direct_kernel(x_hbm, w_ref, b_ref, s_ref, o_ref, band, rolled,
                           sem, *, cin, cout, wo_pad, h_in, w_in, n_h,
                           act, alpha, precision):
    """Stride-1 3x3 pad-1 conv straight off the plain BHCW tensor — the
    same zero-prolog addressing as :func:`_conv_s2_direct_kernel` (see its
    docstring), minus the H phases and the column extraction: output row r
    tap (ky, kx) reads band row r+ky; column -1 is the band lane-roll."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = TH + 2

    @pl.when((i == 0) & (j == 0))
    def _zero_margins():
        # as in the s2 kernel: the PERSISTENT zero region is only cols
        # [w_in, bandw) — never DMA'd, so zeroing once persists.  Channel
        # slot tails inside [0, w_in) are re-DMA'd every tile; the Mosaic
        # alignment fix zero-pads the operands themselves, so that refill
        # carries zeros and is idempotent.
        band[...] = jnp.zeros_like(band[...])

    def dma(src_rows0, src_nrows, dst_row0):
        cp = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(src_rows0, src_nrows)],
            band.at[pl.ds(dst_row0, src_nrows), pl.ds(0, cin),
                    pl.ds(0, w_in)],
            sem,
        )
        cp.start()
        cp.wait()

    if n_h == 1:
        band[0] = jnp.zeros_like(band[0])
        for rr in range(1 + h_in, rows):
            band[rr] = jnp.zeros_like(band[rr])
        dma(0, h_in, 1)
    else:
        first = j == 0
        last = j == n_h - 1
        avail = h_in - ((n_h - 1) * TH - 1)  # static rows in last tile

        @pl.when(first)
        def _top():
            band[0] = jnp.zeros_like(band[0])
            dma(0, rows - 1, 1)

        @pl.when(last)
        def _bottom():
            for rr in range(avail, rows):
                band[rr] = jnp.zeros_like(band[rr])
            dma((n_h - 1) * TH - 1, avail, 0)

        @pl.when(jnp.logical_not(first | last))
        def _interior():
            dma(j * TH - 1, rows, 0)

    rolled[...] = jnp.roll(band[...], 1, axis=2)

    for r in range(TH):
        acc = None
        for t in range(9):
            ky, kx = divmod(t, 3)
            src = rolled if kx == 0 else band
            start = 0 if kx == 0 else kx - 1
            d = lax.dot_general(
                w_ref[t], src[r + ky, :, pl.ds(start, wo_pad)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            acc = d if acc is None else acc + d
        acc = _apply_act(acc + b_ref[:], act, alpha, s_ref)
        o_ref[0, 0, r] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "alpha", "out_h", "out_w")
)
def _conv_planar_s1_direct(x, wmat, bias, *, act, alpha, out_h, out_w,
                           slope=None):
    """x (B, H, Cin, W) BHCW -> (B, out_h, Cout, out_w); 3x3 s1 p1, zero
    host prolog."""
    b, h, cin, w = x.shape
    # Mosaic requires HBM DMA slices to be lane-aligned on the minor dim:
    # a W that is not a multiple of 128 (e.g. 960 at half-res 1080p) makes
    # the kernel's full-width row copy an unaligned slice of the padded
    # memref.  Pad W up front (a minor-dim zero append — the band margins
    # are zero anyway); full-res 1920 is already aligned and pays nothing.
    wal = _round_up(w, LANE)
    cal = _round_up(cin, TH)
    if wal != w or cal != cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cal - cin), (0, wal - w)))
        w, cin = wal, cal
    cout = wmat.shape[1]
    cp8 = wmat.shape[2]
    wo_pad = _round_up(out_w, LANE)
    bandw = wo_pad + LANE
    n_h = _round_up(out_h, TH) // TH
    if slope is None:
        slope = jnp.zeros((cout, 1), jnp.float32)
    precision = (lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    out = pl.pallas_call(
        functools.partial(
            _conv_s1_direct_kernel, cin=cin, cout=cout, wo_pad=wo_pad,
            h_in=h, w_in=w, n_h=n_h, act=act, alpha=alpha,
            precision=precision,
        ),
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cout, cp8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TH, cout, wo_pad),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_h, TH, cout, wo_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, cp8, bandw), x.dtype),
            pltpu.VMEM((TH + 2, cp8, bandw), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x, wmat, bias, slope)
    return out.reshape(b, n_h * TH, cout, wo_pad)[:, :out_h, :, :out_w]


def _conv_s2_direct_kernel(*refs, part_channels, cout, wo_pad, h_in, w_in,
                           n_h, act, alpha, precision):
    """Stride-2 3x3 pad-1 conv straight off the plain BHCW tensor.

    The packed-phase kernel above needs a host-side prolog — ``jnp.pad`` to
    rows/cols [2, ...) plus the (B,H,C,W)->(B,H/2,2C,W) reshape, which is a
    real relayout whenever C is not a sublane multiple — measured ~12 ms of
    the B=24 v4.6 region-mode step (BASELINE.md round-3 region-leak
    attribution).  Here the H phases are resolved by the DMA/tap addressing
    instead: output row tile j loads input rows [2jTH-1, 2jTH+2TH+1) and
    tap (ky, kx) of output row r reads band row 2r+ky; the pad column -1 is
    one lane-roll of the band (band's width margin is kept zero, so the
    wrapped column IS the zero pad); taps kx in {1,2} slice at kx-1; all
    taps land output column x' at rhs column 2x', extracted once per row.
    Band edges (row -1, rows >= h_in) are zero-filled by the edge branches.

    Multi-input form (``ConvolutionCat``): each concat part DMAs into its
    own 8-aligned channel slot of the band — the channel concat feeding
    the conv never materializes in HBM.  ``refs`` is
    ``(*x_hbms, w_ref, b_ref, s_ref, o_ref, band, rolled, sem)``.
    """
    n_parts = len(part_channels)
    x_hbms = refs[:n_parts]
    w_ref, b_ref, s_ref, o_ref, band, rolled, sem = refs[n_parts:]
    i = pl.program_id(0)
    j = pl.program_id(1)
    w2 = 2 * wo_pad
    rows = 2 * TH + 2

    @pl.when((i == 0) & (j == 0))
    def _zero_margins():
        # the band's PERSISTENT zero region is only cols [w_in, bandw) —
        # w_in is the (lane-padded) operand width, so those cols are never
        # DMA'd and zeroing once here persists across grid cells.  Channel
        # slot tails inside [0, w_in) ARE re-DMA'd every tile since the
        # Mosaic alignment fix zero-pads the operands themselves (the
        # padded rows/cols carry zeros, so the refill is idempotent).
        band[...] = jnp.zeros_like(band[...])

    def dma(src_rows0, src_nrows, dst_row0):
        off = 0
        for x_hbm, cin in zip(x_hbms, part_channels):
            cp = pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(src_rows0, src_nrows)],
                band.at[pl.ds(dst_row0, src_nrows),
                        pl.ds(off, cin), pl.ds(0, w_in)],
                sem,
            )
            cp.start()
            cp.wait()
            off += _round_up(cin, TH)

    if n_h == 1:
        band[0] = jnp.zeros_like(band[0])
        for rr in range(1 + h_in, rows):
            band[rr] = jnp.zeros_like(band[rr])
        dma(0, h_in, 1)
    else:
        first = j == 0
        last = j == n_h - 1
        avail = h_in - (2 * (n_h - 1) * TH - 1)  # static rows in last tile

        @pl.when(first)
        def _top():
            band[0] = jnp.zeros_like(band[0])
            dma(0, rows - 1, 1)

        @pl.when(last)
        def _bottom():
            for rr in range(avail, rows):
                band[rr] = jnp.zeros_like(band[rr])
            dma(2 * (n_h - 1) * TH - 1, avail, 0)

        @pl.when(jnp.logical_not(first | last))
        def _interior():
            dma(2 * j * TH - 1, rows, 0)

    rolled[...] = jnp.roll(band[...], 1, axis=2)

    jj = lax.broadcasted_iota(jnp.int32, (cout, LANE), 1)
    idx_a = jnp.minimum(2 * jj, LANE - 1)
    idx_b = jnp.maximum(2 * jj - LANE, 0)
    sel_a = (2 * jj) < LANE

    for r in range(TH):
        acc = None
        for t in range(9):
            ky, kx = divmod(t, 3)
            src = rolled if kx == 0 else band
            start = 0 if kx == 0 else kx - 1
            d = lax.dot_general(
                w_ref[t], src[2 * r + ky, :, pl.ds(start, w2)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            acc = d if acc is None else acc + d
        acc = _apply_act(acc + b_ref[:], act, alpha, s_ref)
        for ot in range(wo_pad // LANE):
            src_a = acc[:, 2 * ot * LANE : (2 * ot + 1) * LANE]
            src_b = acc[:, (2 * ot + 1) * LANE : (2 * ot + 2) * LANE]
            ga = jnp.take_along_axis(src_a, idx_a, axis=1)
            gb = jnp.take_along_axis(src_b, idx_b, axis=1)
            o_ref[0, 0, r, :, pl.ds(ot * LANE, LANE)] = jnp.where(
                sel_a, ga, gb
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "alpha", "out_h", "out_w")
)
def _conv_planar_s2_direct(x, wmat, bias, *, act, alpha, out_h, out_w,
                           slope=None):
    """x (B, H, Cin, W) BHCW -> (B, out_h, Cout, out_w); 3x3 stride 2,
    zero host prolog (pad/phase-reshape resolved in-kernel)."""
    return _conv_planar_s2_direct_cat(
        (x,), wmat, bias, act=act, alpha=alpha, out_h=out_h, out_w=out_w,
        slope=slope)


@functools.partial(
    jax.jit, static_argnames=("act", "alpha", "out_h", "out_w")
)
def _conv_planar_s2_direct_cat(parts, wmat, bias, *, act, alpha,
                               out_h, out_w, slope=None):
    """Multi-input form: ``parts`` are BHCW tensors whose channel concat is
    the conv input (the concat never materializes; each part DMAs into its
    own 8-aligned band slot).  ``wmat`` from :func:`pack_weights_cat`."""
    b, h, _, w = parts[0].shape
    # lane-align W and sublane-align each part's channels for the in-kernel
    # HBM DMAs (see _conv_planar_s1_direct): the padded channels land in the
    # band slot's zero tail (weights there are zero, pack_weights_cat)
    wal = _round_up(w, LANE)
    if wal != w or any(p.shape[2] % TH for p in parts):
        parts = tuple(
            jnp.pad(p, ((0, 0), (0, 0),
                        (0, _round_up(p.shape[2], TH) - p.shape[2]),
                        (0, wal - w))) for p in parts
        )
        w = wal
    cout = wmat.shape[1]
    cp8 = wmat.shape[2]
    part_channels = tuple(p.shape[2] for p in parts)
    assert cp8 == sum(_round_up(c, TH) for c in part_channels)
    wo_pad = _round_up(out_w, LANE)
    bandw = 2 * wo_pad + LANE
    n_h = _round_up(out_h, TH) // TH
    if slope is None:
        slope = jnp.zeros((cout, 1), jnp.float32)
    precision = (lax.Precision.HIGHEST if parts[0].dtype == jnp.float32
                 else lax.Precision.DEFAULT)
    out = pl.pallas_call(
        functools.partial(
            _conv_s2_direct_kernel, part_channels=part_channels, cout=cout,
            wo_pad=wo_pad, h_in=h, w_in=w, n_h=n_h, act=act, alpha=alpha,
            precision=precision,
        ),
        grid=(b, n_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in parts] + [
            pl.BlockSpec((9, cout, cp8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TH, cout, wo_pad),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_h, TH, cout, wo_pad), parts[0].dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * TH + 2, cp8, bandw), parts[0].dtype),
            pltpu.VMEM((2 * TH + 2, cp8, bandw), parts[0].dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(*parts, wmat, bias, slope)
    return out.reshape(b, n_h * TH, cout, wo_pad)[:, :out_h, :, :out_w]


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


def pack_weights_cat(w_hwio, part_channels, dtype=jnp.bfloat16):
    """(kh,kw,sum(c_i),Cout) -> (kh*kw, Cout, sum(round_up(c_i,8))) with
    each concat part's channel block padded to its 8-aligned band slot
    (matching :func:`_conv_planar_s2_direct_cat`'s DMA layout)."""
    kh, kw, _, co = w_hwio.shape
    blocks = []
    off = 0
    for c in part_channels:
        blk = w_hwio[:, :, off:off + c, :].astype(dtype)
        wm = blk.reshape(kh * kw, c, co).transpose(0, 2, 1)
        cp = _round_up(c, TH)
        if cp != c:
            wm = jnp.pad(wm, ((0, 0), (0, 0), (0, cp - c)))
        blocks.append(wm)
        off += c
    return jnp.concatenate(blocks, axis=2)


def pack_s2_weights(w_hwio, dtype=jnp.bfloat16):
    """3x3 s2 p1 kernel -> (6, Cout, round_up(2*Cin, 8)): taps (H-phase a,
    kx), channels [py][c] matching the free H-phase reshape.

    Derivation: out row y' tap ky reads input row 2y'+ky-1; with the input
    padded to rows [2, ...) and H-split, that is split-row y'+a, phase
    block py, where py=(ky-1)%2 and a=(ky-1-py)//2+1."""
    kh, kw, ci, co = w_hwio.shape
    assert kh == 3 and kw == 3
    c2p = _round_up(2 * ci, TH)
    zero = jnp.zeros((co, ci), w_hwio.dtype)
    taps = []
    for a in range(2):
        for kx in range(3):
            # [py][c] channel blocks; ky contributes to H-tap a=(ky-1-py)//2+1
            blocks = [zero, zero]
            for ky in range(3):
                py = (ky - 1) % 2
                if (ky - 1 - py) // 2 + 1 == a:
                    blocks[py] = blocks[py] + w_hwio[ky, kx].T
            taps.append(jnp.concatenate(blocks, axis=1))
    wm = jnp.stack(taps)  # (6, co, 2*ci)
    if 2 * ci < c2p:
        wm = jnp.pad(wm, ((0, 0), (0, 0), (0, c2p - 2 * ci)))
    return wm.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "pad", "act", "alpha", "out_h", "out_w"),
)
def _conv_planar_s1(x, wmat, bias, *, kh, kw, pad, act, alpha,
                    out_h, out_w, slope=None):
    """x (B, H, Cin, W) BHCW -> (B, out_h, Cout, out_w); stride 1."""
    b, h, cin, w = x.shape
    wo_pad = _round_up(out_w, LANE)
    wp = wo_pad + LANE
    hp = _round_up(out_h, TH) + kh - 1
    # bake conv zero-padding into the plane: data at rows/cols [pad, ...);
    # channels zero-padded to the 8-sublane tile (DMA slice alignment)
    xp = jnp.pad(
        x, ((0, 0), (pad, hp - h - pad), (0, _round_up(cin, TH) - cin),
            (pad, wp - w - pad))
    )
    out = conv_planar_bhcw(xp, wmat, bias, kh=kh, kw=kw, out_h=out_h,
                           act=act, alpha=alpha, slope=slope)
    return out[:, :out_h, :, :out_w]


@functools.partial(
    jax.jit, static_argnames=("act", "alpha", "out_h", "out_w")
)
def _conv_planar_s2(x, wmat, bias, *, act, alpha, out_h, out_w, slope=None):
    """x (B, H, Cin, W) BHCW -> (B, out_h, Cout, out_w); 3x3 stride 2."""
    b, h, cin, w = x.shape
    wo_pad = _round_up(out_w, LANE)
    wpf = 2 * wo_pad + LANE
    hp2 = _round_up(out_h, TH) + 1
    c2p = _round_up(2 * cin, TH)
    # rows/cols at [2, ...): after the free H reshape the first split row /
    # even-odd column pair are the phase-plane pad slots
    xp = jnp.pad(x, ((0, 0), (2, 2 * hp2 - h - 2), (0, 0),
                     (2, wpf - w - 2)))
    xs = xp.reshape(b, hp2, 2 * cin, wpf)
    if 2 * cin < c2p:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, c2p - 2 * cin), (0, 0)))
    out = conv_s2_bhcw(xs, wmat, bias, out_h, act=act, alpha=alpha,
                       slope=slope)
    return out[:, :out_h, :, :out_w]


def conv_planar(x, w_hwio, bias=None, *, stride=1, pad=1,
                act=ACT_NONE, alpha=0.2, slope=None):
    """BHCW conv via the planar Pallas kernels.

    x (B, H, Cin, W); w (kh, kw, Cin, Cout) as in jax_ops.conv2d; stride
    1 or 2 (stride 2 requires kh=kw=3, pad=1 — the zoo's only s2 shape).
    ``slope`` (Cout,) enables fused per-channel PReLU when act=ACT_PRELU.
    Returns (B, Hout, Cout, Wout).
    """
    b, h, cin, w = x.shape
    kh, kw, _, cout = w_hwio.shape
    bb = (jnp.zeros((cout, 1), jnp.float32) if bias is None
          else bias.reshape(cout, 1).astype(jnp.float32))
    # ncnn PReLU slope may be per-channel or a single shared scalar
    sl = (None if slope is None else jnp.broadcast_to(
        slope.reshape(-1, 1).astype(jnp.float32), (cout, 1)))
    wdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    if stride == 2:
        assert (kh, kw, pad) == (3, 3, 1) and h % 2 == 0 and w % 2 == 0
        import os

        if os.environ.get("RIFE_TPU_S2_DIRECT", "1") != "0":
            wm = pack_weights(w_hwio, cin, wdt)
            return _conv_planar_s2_direct(x, wm, bb, act=act, alpha=alpha,
                                          out_h=h // 2, out_w=w // 2,
                                          slope=sl)
        wm = pack_s2_weights(w_hwio, wdt)
        return _conv_planar_s2(x, wm, bb, act=act, alpha=alpha,
                               out_h=h // 2, out_w=w // 2, slope=sl)
    assert stride == 1
    out_h = h + 2 * pad - (kh - 1)
    out_w = w + 2 * pad - (kw - 1)
    wm = pack_weights(w_hwio, cin, wdt)
    import os

    if (kh, kw, pad) == (3, 3, 1) and os.environ.get(
            "RIFE_TPU_S1_DIRECT", "1") != "0":
        return _conv_planar_s1_direct(x, wm, bb, act=act, alpha=alpha,
                                      out_h=out_h, out_w=out_w, slope=sl)
    return _conv_planar_s1(
        x, wm, bb, kh=kh, kw=kw, pad=pad, act=act, alpha=alpha,
        out_h=out_h, out_w=out_w, slope=sl,
    )


def conv_planar_cat(parts, w_hwio, bias=None, *, act=ACT_NONE, alpha=0.2,
                    slope=None):
    """3x3 stride-2 pad-1 BHCW conv over the channel-concat of ``parts``
    without materializing the concat (graph/rewrite.py
    ``fuse_concat_into_convs``).  Semantics identical to
    ``conv_planar(concat(parts, C-axis), ...)`` with stride 2."""
    b, h, _, w = parts[0].shape
    kh, kw, cin, cout = w_hwio.shape
    assert (kh, kw) == (3, 3) and h % 2 == 0 and w % 2 == 0
    assert cin == sum(p.shape[2] for p in parts)
    bb = (jnp.zeros((cout, 1), jnp.float32) if bias is None
          else bias.reshape(cout, 1).astype(jnp.float32))
    sl = (None if slope is None else jnp.broadcast_to(
        slope.reshape(-1, 1).astype(jnp.float32), (cout, 1)))
    wdt = parts[0].dtype if parts[0].dtype == jnp.bfloat16 else jnp.float32
    wm = pack_weights_cat(w_hwio, tuple(p.shape[2] for p in parts), wdt)
    return _conv_planar_s2_direct_cat(
        tuple(parts), wm, bb, act=act, alpha=alpha,
        out_h=h // 2, out_w=w // 2, slope=sl)


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
    """BHCW ConvTranspose 4x4 s2 p1 via one planar conv producing the four
    output phases, then a phase interleave.  Matches ``jax_ops.deconv2d``
    (same spatially-flipped HWIO weight layout).

    The H interleave is a FREE reshape of the [py][px][c] phase channels;
    only the W interleave moves lanes.
    """
    b, h, cin, w = x.shape
    co = w_hwio_flipped.shape[-1]
    w3 = _deconv_phase_weights(w_hwio_flipped)
    bb = None if bias is None else jnp.tile(bias.reshape(co), 4)
    sl = (None if slope is None else jnp.tile(
        jnp.broadcast_to(slope.reshape(-1), (co,)), 4))
    y4 = conv_planar(x, w3, bb, stride=1, pad=1, act=act, alpha=alpha,
                     slope=sl)
    # (B, H, {py,px,c}, W): H interleave = free reshape
    y = y4.reshape(b, 2 * h, 2 * co, w)
    # W interleave: (B, 2H, {px,c}, W) -> (B, 2H, c, 2W)
    y = y.reshape(b, 2 * h, 2, co, w).transpose(0, 1, 3, 4, 2)
    return y.reshape(b, 2 * h, co, 2 * w)


def conv_ps_planar(x, w_hwio, bias=None, *, r=2, stride=1, pad=1,
                   act=ACT_NONE, alpha=0.2, slope=None):
    """BHCW Convolution followed by PixelShuffle(r), the shuffle's channel
    regrouping baked into the conv's output-channel ORDER (a static weight
    permutation): channels come out Y-subphase-major ({i, j, c} instead of
    torch's {c, i, j}), so the H interleave is a FREE BHCW reshape and only
    one W lane-interleave remains.  Matches
    ``pixel_shuffle(conv_planar_ref(...))`` exactly (same float ops, just
    reordered writes).  Reference: /root/reference/models/rife/
    flownet.param:77-78 (Conv 3x3 -> DepthToSpace)."""
    import numpy as np

    co = w_hwio.shape[-1]
    c = co // (r * r)
    # target channel t = (i*r + j)*c + cc  <-  source channel cc*r*r + i*r + j
    t = np.arange(co)
    src = (t % c) * (r * r) + t // c
    bb = None if bias is None else jnp.asarray(bias).reshape(co)[src]
    sl = (None if slope is None else
          jnp.broadcast_to(jnp.asarray(slope).reshape(-1), (co,))[src])
    y = conv_planar(x, w_hwio[..., src], bb, stride=stride, pad=pad,
                    act=act, alpha=alpha, slope=sl)
    b, oh, _, ow = y.shape
    y = y.reshape(b, oh * r, r * c, ow)  # H interleave: free reshape
    y = y.reshape(b, oh * r, r, c, ow).transpose(0, 1, 3, 4, 2)
    return y.reshape(b, oh * r, c, ow * r)


def deconv_ps_planar(x, w_hwio_flipped, bias=None, *, act=ACT_NONE,
                     alpha=0.2, slope=None):
    """BHCW ConvTranspose 4x4 s2 p1 followed by PixelShuffle(2) — the v4
    block tail (/root/reference/models/rife-v4.6/flownet.param:45-46) — as
    ONE planar phase conv whose output channels are ordered
    {(2py+i), (2px+j), c}: the combined x4 H interleave is a free BHCW
    reshape, and the deconv phase interleave + the full-res PixelShuffle
    relayout collapse into a single x4 W lane-interleave (the intermediate
    24ch tensor never touches HBM).  Bit-identical to
    ``pixel_shuffle(deconv_planar(...))``."""
    import numpy as np

    b, h, cin, w = x.shape
    co = w_hwio_flipped.shape[-1]
    c = co // 4
    w3 = _deconv_phase_weights(w_hwio_flipped)
    # source channel s = (py*2+px)*co + cc*4 + i*2 + j  (deconv phase blocks
    # of torch-PS-ordered channels); fused target t = ((2py+i)*4+(2px+j))*c+cc
    t = np.arange(4 * co)
    cc = t % c
    pxj = (t // c) % 4
    pyi = t // (4 * c)
    src = ((pyi // 2) * 2 + pxj // 2) * co + cc * 4 + (pyi % 2) * 2 + pxj % 2
    bb = None if bias is None else jnp.asarray(bias).reshape(co)[src % co]
    sl = (None if slope is None else jnp.broadcast_to(
        jnp.asarray(slope).reshape(-1), (co,))[src % co])
    y = conv_planar(x, w3[..., src], bb, stride=1, pad=1, act=act,
                    alpha=alpha, slope=sl)
    y = y.reshape(b, 4 * h, 4 * c, w)  # x4 H interleave: free reshape
    y = y.reshape(b, 4 * h, 4, c, w).transpose(0, 1, 3, 4, 2)
    return y.reshape(b, 4 * h, c, 4 * w)


def conv_planar_ref(x, w_hwio, bias=None, *, stride=1, pad=1,
                    act=ACT_NONE, alpha=0.2):
    """XLA reference with identical semantics (NCHW in/out, for tests)."""
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
