"""Pallas TPU kernel for backward bilinear warp.

Why: XLA lowers the per-pixel 2D gather to near-scalar loads — one 1080p
3-channel warp costs ~300 ms on v5e and warps are ~88% of the whole RIFE
forward (measured by ablation).  Mosaic's fast primitive is
``jnp.take_along_axis`` along the 128-lane dimension *within one lane tile*;
an arbitrary 2D per-pixel gather cannot be composed from two 1D per-element
gathers (the second stage would read index fields evaluated at the wrong
coordinate), so this kernel keeps the 2D gather whole:

For each output stripe (8 rows x 128 lanes) it walks the *dynamic* source
row-band range [min(y0)//8, max(y1)//8] and source lane-tile range
[min(x0)//128, max(x1)//128] actually referenced by the stripe (sublane loads
must be 8-aligned, hence bands).  For each (band, tile) it lane-gathers the
two needed columns from each of the 8 band rows and accumulates the four
bilinear corners via one-hot row matching:

    out += g(x0) * [(y0==r)·w00 + (y1==r)·w10]   (x0 within tile t)
    out += g(x1) * [(y0==r)·w01 + (y1==r)·w11]   (x1 within tile t)

Cost adapts to flow magnitude — measured on v5e at 1080p 3ch: ~4 ms for
near-zero flow, ~12 ms at ±30 px smooth flow, ~25 ms for adversarial iid
noise (vs ~300 ms for the XLA gather).  Arbitrary flows stay exact.

Index/fraction algebra is bit-identical to ``jax_ops.warp`` / the reference
shader (clamped corners, fractions from clamped corners —
/root/reference/src/warp.comp:42-63); y0/x0/alpha/beta are precomputed as
cheap XLA elementwise ops (computing the floor/clip chain fully in-kernel
stalls the Mosaic compiler); y1/x1 are rebuilt in-kernel as min(+1, limit),
which differs from the shader's clip(floor+1) only where the corresponding
bilinear weight is exactly zero.  Out-of-range fractions are clamped to
[0,1]: both corners coincide there, so the value is unchanged but the
shader's catastrophic (1-a)v + av cancellation for |a|>>1 is avoided.

Variants: per-plane f32, bf16 pair-packed (2 channels per i32 word), and
for u8-origin images the quad-packed kernel (whole RGB pixel per word) with
a VMEM-resident image up to ~1080p and slab streaming at any larger size.
Float kernels need the plane resident in VMEM; callers fall back to the XLA
gather beyond that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TH = 8  # output stripe height == sublane tile == row-band height

# VMEM budget for the resident image plane (f32 bytes)
_VMEM_IMAGE_LIMIT = 9 * 1024 * 1024


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _warp_kernel(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                 o_ref, img_ref, sem, *, nt_w: int, h_max: int, w_max: int):
    # stage the full image plane into single-buffered VMEM scratch once per
    # (batch*channel) plane (letting Pallas block it would double-buffer
    # ~8.4MB and blow the 16MB VMEM budget inside larger programs)
    @pl.when(pl.program_id(1) == 0)
    def _():
        cp = pltpu.make_async_copy(
            img_hbm.at[pl.program_id(0)], img_ref, sem
        )
        cp.start()
        cp.wait()

    for lo in range(nt_w):
        sl = pl.ds(lo * LANE, LANE)
        y0 = y0_ref[0, :, sl]
        x0 = x0_ref[0, :, sl]
        # (+1, clamped) differs from the shader's clip(floor+1) only where
        # the corresponding bilinear weight is exactly zero — see
        # _warp_kernel_u8
        y1 = jnp.minimum(y0 + 1, h_max)
        x1 = jnp.minimum(x0 + 1, w_max)
        alpha = a_ref[0, :, sl]
        beta = b_ref[0, :, sl]
        w00 = (1.0 - alpha) * (1.0 - beta)
        w01 = alpha * (1.0 - beta)
        w10 = (1.0 - alpha) * beta
        w11 = alpha * beta

        band_lo = jnp.min(y0) // TH
        band_hi = jnp.max(y1) // TH
        t_lo = jnp.min(x0) // LANE
        t_hi = jnp.max(x1) // LANE

        def band_body(band, acc):
            def tile_body(t, acc):
                chunk = img_ref[
                    pl.ds(pl.multiple_of(band * TH, TH), TH),
                    pl.ds(t * LANE, LANE),
                ]
                lx0 = x0 - t * LANE
                lx1 = x1 - t * LANE
                ok0 = (lx0 >= 0) & (lx0 < LANE)
                ok1 = (lx1 >= 0) & (lx1 < LANE)
                lx0c = jnp.clip(lx0, 0, LANE - 1)
                lx1c = jnp.clip(lx1, 0, LANE - 1)
                zero = jnp.zeros_like(w00)
                for k in range(TH):
                    r = band * TH + k
                    m_y0 = (y0 == r)
                    m_y1 = (y1 == r)
                    tile = jnp.broadcast_to(chunk[k : k + 1, :], (TH, LANE))
                    g0 = jnp.take_along_axis(tile, lx0c, axis=1)
                    g1 = jnp.take_along_axis(tile, lx1c, axis=1)
                    acc = acc + g0 * (
                        jnp.where(m_y0 & ok0, w00, zero)
                        + jnp.where(m_y1 & ok0, w10, zero)
                    )
                    acc = acc + g1 * (
                        jnp.where(m_y0 & ok1, w01, zero)
                        + jnp.where(m_y1 & ok1, w11, zero)
                    )
                return acc

            return lax.fori_loop(t_lo, t_hi + 1, tile_body, acc)

        acc = lax.fori_loop(
            band_lo, band_hi + 1, band_body,
            jnp.zeros((TH, LANE), jnp.float32),
        )
        o_ref[0, :, sl] = acc.astype(o_ref.dtype)


def _flow_xy(flow, planar: bool):
    """(flow_x, flow_y) planes of a (B,H,W,2) NHWC or (B,H,2,W) planar
    (BHCW) flow — the planar form slices channel slabs instead of
    lane-strided channels."""
    if planar:
        return (flow[:, :, 0, :].astype(jnp.float32),
                flow[:, :, 1, :].astype(jnp.float32))
    return flow[..., 0].astype(jnp.float32), flow[..., 1].astype(jnp.float32)


def _warp_pallas_impl(image, flow, *, abs_pos: bool = False,
                      planar: bool = False):
    if planar:
        b, h, c, w = image.shape  # BHCW
    else:
        b, h, w, c = image.shape
    out_dtype = image.dtype
    hp, wp = _round_up(h, TH), _round_up(w, LANE)       # source staging
    if abs_pos:  # flow = absolute (sx, sy) on a decoupled output grid
        ho, wo = (flow.shape[1], flow.shape[3]) if planar else (
            flow.shape[1], flow.shape[2])
    else:
        ho, wo = h, w
    hp_o, wp_o = _round_up(ho, TH), _round_up(wo, LANE)  # output grid
    nt_w = wp_o // LANE

    # exact shader index/fraction algebra (cheap XLA elementwise)
    fx, fy = _flow_xy(flow, planar)
    if abs_pos:
        sx, sy = fx, fy
    else:
        gy = lax.broadcasted_iota(jnp.float32, (ho, wo), 0)
        gx = lax.broadcasted_iota(jnp.float32, (ho, wo), 1)
        sx = gx[None] + fx
        sy = gy[None] + fy
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    # For out-of-range samples both corners clamp to the same pixel, so the
    # fraction cancels mathematically; clamping avoids the catastrophic
    # (1-a)*v + a*v cancellation the shader formula incurs for huge |a|.
    alpha = jnp.clip(sx - x0.astype(jnp.float32), 0.0, 1.0)
    beta = jnp.clip(sy - y0.astype(jnp.float32), 0.0, 1.0)

    def pad2(x, val=0):
        return jnp.pad(
            x, ((0, 0), (0, hp - x.shape[1]), (0, wp - x.shape[2])),
            constant_values=val,
        )

    if planar:  # BHCW -> per-channel planes
        img = pad2(
            image.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
                b * c, h, w
            )
        )
    else:
        img = pad2(
            jnp.transpose(image.astype(jnp.float32), (0, 3, 1, 2)).reshape(
                b * c, h, w
            )
        )
    # EDGE-pad the index/weight operands: zero-padding poisons the padded
    # columns' y0/x0 with 0, dragging every window's dynamic band/tile range
    # down to the frame origin — at widths that aren't lane multiples (e.g.
    # the 1088-wide transposed TTA group) the last window of every stripe
    # then walks the whole frame (measured 10x: 171 ms vs 17 ms at B=4).
    # Padded outputs are garbage and cropped; only the ranges matter.
    def pad2_edge(x):
        return jnp.pad(
            x, ((0, 0), (0, hp_o - x.shape[1]), (0, wp_o - x.shape[2])),
            mode="edge",
        )

    operands = [pad2_edge(v) for v in (y0, x0, alpha, beta)]

    grid = (b * c, hp_o // TH)
    img_spec = pl.BlockSpec(memory_space=pl.ANY)
    stripe = lambda i, j: (i // c, j, 0)  # noqa: E731 - flow shared over C
    idx_spec = pl.BlockSpec((1, TH, wp_o), stripe, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _warp_kernel, nt_w=nt_w, h_max=h - 1, w_max=w - 1
        ),
        grid=grid,
        in_specs=[img_spec] + [idx_spec] * 4,
        out_specs=pl.BlockSpec(
            (1, TH, wp_o), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * c, hp_o, wp_o), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(img, *operands)

    out = out[:, :ho, :wo].reshape(b, c, ho, wo)
    if planar:
        return out.transpose(0, 2, 1, 3)  # -> BHCW
    return out.transpose(0, 2, 3, 1)


def _warp_kernel_packed(img_hbm, y0_ref, x0_ref, a_ref,
                        b_ref, o0_ref, o1_ref, img_ref, sem, *,
                        nt_w: int, h_max: int, w_max: int):
    """Pair-packed variant: each i32 gather word carries two bf16 channels
    (low/high 16 bits), halving gather traffic and sharing all mask/weight
    math between the pair.  bf16 -> f32 unpack is a shift + bitcast (the f32
    bit pattern of a bf16 is its bits << 16)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        cp = pltpu.make_async_copy(img_hbm.at[pl.program_id(0)], img_ref, sem)
        cp.start()
        cp.wait()

    for lo in range(nt_w):
        sl = pl.ds(lo * LANE, LANE)
        y0 = y0_ref[0, :, sl]
        x0 = x0_ref[0, :, sl]
        y1 = jnp.minimum(y0 + 1, h_max)
        x1 = jnp.minimum(x0 + 1, w_max)
        alpha = a_ref[0, :, sl]
        beta = b_ref[0, :, sl]
        w00 = (1.0 - alpha) * (1.0 - beta)
        w01 = alpha * (1.0 - beta)
        w10 = (1.0 - alpha) * beta
        w11 = alpha * beta

        band_lo = jnp.min(y0) // TH
        band_hi = jnp.max(y1) // TH
        t_lo = jnp.min(x0) // LANE
        t_hi = jnp.max(x1) // LANE

        def unpack(g):
            v0 = pltpu.bitcast(g << 16, jnp.float32)
            v1 = pltpu.bitcast(g & jnp.int32(-65536), jnp.float32)
            return v0, v1

        def band_body(band, accs):
            def tile_body(t, accs):
                acc0, acc1 = accs
                chunk = img_ref[
                    pl.ds(pl.multiple_of(band * TH, TH), TH),
                    pl.ds(t * LANE, LANE),
                ]
                lx0 = x0 - t * LANE
                lx1 = x1 - t * LANE
                ok0 = (lx0 >= 0) & (lx0 < LANE)
                ok1 = (lx1 >= 0) & (lx1 < LANE)
                lx0c = jnp.clip(lx0, 0, LANE - 1)
                lx1c = jnp.clip(lx1, 0, LANE - 1)
                zero = jnp.zeros_like(w00)
                for k in range(TH):
                    r = band * TH + k
                    m_y0 = (y0 == r)
                    m_y1 = (y1 == r)
                    tile = jnp.broadcast_to(chunk[k : k + 1, :], (TH, LANE))
                    g0 = jnp.take_along_axis(tile, lx0c, axis=1)
                    g1 = jnp.take_along_axis(tile, lx1c, axis=1)
                    wg0 = (
                        jnp.where(m_y0 & ok0, w00, zero)
                        + jnp.where(m_y1 & ok0, w10, zero)
                    )
                    wg1 = (
                        jnp.where(m_y0 & ok1, w01, zero)
                        + jnp.where(m_y1 & ok1, w11, zero)
                    )
                    a0, b0 = unpack(g0)
                    a1, b1 = unpack(g1)
                    acc0 = acc0 + a0 * wg0 + a1 * wg1
                    acc1 = acc1 + b0 * wg0 + b1 * wg1
                return (acc0, acc1)

            return lax.fori_loop(t_lo, t_hi + 1, tile_body, accs)

        zeros = jnp.zeros((TH, LANE), jnp.float32)
        acc0, acc1 = lax.fori_loop(
            band_lo, band_hi + 1, band_body, (zeros, zeros)
        )
        o0_ref[0, :, sl] = acc0
        o1_ref[0, :, sl] = acc1


def _warp_kernel_packed_mc(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                           o0_ref, o1_ref, slab, sem, *,
                           gs: int, nt_w: int, h_max: int, w_max: int):
    """Multi-channel pair-packed variant: ONE set of index loads, dynamic
    ranges, masks and bilinear weights per (stripe, band, window) serves
    ALL c2 channel words (the flow is channel-independent), instead of the
    single-pair kernel's one-full-pass-per-pair grid.  v2 contextnet
    feature warps (C=32 @ 544x960, C=64 @ 272x480) are the motivation:
    they dominate the v2.3 step (4 calls x 15-16.5 ms of a 247 ms step at
    B=4, BASELINE.md round-3) and their mask/weight algebra is ~half of
    each call.  Channel words stream slab-style per source band (single-
    slot DMA of (gs, 8, Wp) — no VMEM residency ceiling); ``gs``-word
    GROUPS bound the live accumulator count (2*gs vregs) so Mosaic never
    spills — wider channel counts split over grid dim 1."""
    zeros = jnp.zeros((TH, LANE), jnp.float32)
    g_id = pl.program_id(1)

    for lo in range(nt_w):
        sl = pl.ds(lo * LANE, LANE)
        y0 = y0_ref[0, :, sl]
        x0 = x0_ref[0, :, sl]
        y1 = jnp.minimum(y0 + 1, h_max)
        x1 = jnp.minimum(x0 + 1, w_max)
        alpha = a_ref[0, :, sl]
        beta = b_ref[0, :, sl]
        w00 = (1.0 - alpha) * (1.0 - beta)
        w01 = alpha * (1.0 - beta)
        w10 = (1.0 - alpha) * beta
        w11 = alpha * beta

        band_lo = jnp.min(y0) // TH
        band_hi = jnp.max(y1) // TH
        t_lo = jnp.min(x0) // LANE
        t_hi = jnp.max(x1) // LANE

        def unpack(g):
            v0 = pltpu.bitcast(g << 16, jnp.float32)
            v1 = pltpu.bitcast(g & jnp.int32(-65536), jnp.float32)
            return v0, v1

        def band_body(band, accs):
            cp = pltpu.make_async_copy(
                img_hbm.at[
                    pl.program_id(0),
                    pl.ds(pl.multiple_of(g_id * gs, gs), gs),
                    pl.ds(pl.multiple_of(band * TH, TH), TH), :,
                ],
                slab,
                sem,
            )
            cp.start()
            cp.wait()

            def tile_body(t, accs):
                lx0 = x0 - t * LANE
                lx1 = x1 - t * LANE
                ok0 = (lx0 >= 0) & (lx0 < LANE)
                ok1 = (lx1 >= 0) & (lx1 < LANE)
                lx0c = jnp.clip(lx0, 0, LANE - 1)
                lx1c = jnp.clip(lx1, 0, LANE - 1)
                zero = jnp.zeros_like(w00)
                accs = list(accs)
                for k in range(TH):
                    r = band * TH + k
                    m_y0 = (y0 == r)
                    m_y1 = (y1 == r)
                    wg0 = (
                        jnp.where(m_y0 & ok0, w00, zero)
                        + jnp.where(m_y1 & ok0, w10, zero)
                    )
                    wg1 = (
                        jnp.where(m_y0 & ok1, w01, zero)
                        + jnp.where(m_y1 & ok1, w11, zero)
                    )
                    for cw in range(gs):
                        tile = jnp.broadcast_to(
                            slab[cw, k : k + 1, pl.ds(t * LANE, LANE)],
                            (TH, LANE),
                        )
                        g0 = jnp.take_along_axis(tile, lx0c, axis=1)
                        g1 = jnp.take_along_axis(tile, lx1c, axis=1)
                        a0, b0 = unpack(g0)
                        a1, b1 = unpack(g1)
                        accs[2 * cw] = accs[2 * cw] + a0 * wg0 + a1 * wg1
                        accs[2 * cw + 1] = (
                            accs[2 * cw + 1] + b0 * wg0 + b1 * wg1
                        )
                return tuple(accs)

            return lax.fori_loop(t_lo, t_hi + 1, tile_body, accs)

        accs = lax.fori_loop(
            band_lo, band_hi + 1, band_body, (zeros,) * (2 * gs)
        )
        for cw in range(gs):
            o0_ref[0, cw, :, sl] = accs[2 * cw]
            o1_ref[0, cw, :, sl] = accs[2 * cw + 1]


def _warp_kernel_packed_mct(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                            o0_ref, o1_ref, slab, sem, *,
                            gs: int, nt_w: int, h_max: int, w_max: int):
    """TALL form of the multi-channel kernel: instead of looping channel
    words with one (8,128) gather each, every per-iteration op runs once on
    a (gs*8, 128) array — the gs channel words stacked on sublanes — so the
    instruction count per (band, tile, row) drops ~gs-fold while the VPU
    work stays the same.  Wins if Mosaic's per-instruction overhead (issue,
    loop control around many small vregs ops) dominates; the sweep decides
    which form ships (tools/warp_mc_sweep.py)."""
    zeros = jnp.zeros((gs * TH, LANE), jnp.float32)
    g_id = pl.program_id(1)

    def tall(v):  # (TH, LANE) -> (gs*TH, LANE), repeated per word block
        return jnp.broadcast_to(v[None], (gs, TH, LANE)).reshape(
            gs * TH, LANE)

    for lo in range(nt_w):
        sl = pl.ds(lo * LANE, LANE)
        y0 = y0_ref[0, :, sl]
        x0 = x0_ref[0, :, sl]
        y1 = jnp.minimum(y0 + 1, h_max)
        x1 = jnp.minimum(x0 + 1, w_max)
        alpha = a_ref[0, :, sl]
        beta = b_ref[0, :, sl]
        w00 = (1.0 - alpha) * (1.0 - beta)
        w01 = alpha * (1.0 - beta)
        w10 = (1.0 - alpha) * beta
        w11 = alpha * beta

        band_lo = jnp.min(y0) // TH
        band_hi = jnp.max(y1) // TH
        t_lo = jnp.min(x0) // LANE
        t_hi = jnp.max(x1) // LANE

        def unpack(g):
            v0 = pltpu.bitcast(g << 16, jnp.float32)
            v1 = pltpu.bitcast(g & jnp.int32(-65536), jnp.float32)
            return v0, v1

        def band_body(band, accs):
            cp = pltpu.make_async_copy(
                img_hbm.at[
                    pl.program_id(0),
                    pl.ds(pl.multiple_of(g_id * gs, gs), gs),
                    pl.ds(pl.multiple_of(band * TH, TH), TH), :,
                ],
                slab,
                sem,
            )
            cp.start()
            cp.wait()

            def tile_body(t, accs):
                acc0, acc1 = accs
                lx0 = x0 - t * LANE
                lx1 = x1 - t * LANE
                ok0 = (lx0 >= 0) & (lx0 < LANE)
                ok1 = (lx1 >= 0) & (lx1 < LANE)
                idx0 = tall(jnp.clip(lx0, 0, LANE - 1))
                idx1 = tall(jnp.clip(lx1, 0, LANE - 1))
                zero = jnp.zeros_like(w00)
                for k in range(TH):
                    r = band * TH + k
                    m_y0 = (y0 == r)
                    m_y1 = (y1 == r)
                    wg0 = tall(
                        jnp.where(m_y0 & ok0, w00, zero)
                        + jnp.where(m_y1 & ok0, w10, zero)
                    )
                    wg1 = tall(
                        jnp.where(m_y0 & ok1, w01, zero)
                        + jnp.where(m_y1 & ok1, w11, zero)
                    )
                    # all gs words' row k, each repeated over the 8 output
                    # sublanes: (gs, LANE) -> (gs*TH, LANE)
                    rows = slab[:, k, pl.ds(t * LANE, LANE)]
                    tile16 = jnp.broadcast_to(
                        rows[:, None, :], (gs, TH, LANE)
                    ).reshape(gs * TH, LANE)
                    g0 = jnp.take_along_axis(tile16, idx0, axis=1)
                    g1 = jnp.take_along_axis(tile16, idx1, axis=1)
                    a0, b0 = unpack(g0)
                    a1, b1 = unpack(g1)
                    acc0 = acc0 + a0 * wg0 + a1 * wg1
                    acc1 = acc1 + b0 * wg0 + b1 * wg1
                return (acc0, acc1)

            return lax.fori_loop(t_lo, t_hi + 1, tile_body, accs)

        acc0, acc1 = lax.fori_loop(
            band_lo, band_hi + 1, band_body, (zeros, zeros)
        )
        o0_ref[0, :, :, sl] = acc0.reshape(gs, TH, LANE)
        o1_ref[0, :, :, sl] = acc1.reshape(gs, TH, LANE)


def _warp_pallas_packed_impl(image, flow, *, abs_pos: bool = False,
                             planar: bool = False):
    """bf16 path: channels packed in pairs into i32 gather words."""
    if planar:
        b, h, c, w = image.shape  # BHCW
    else:
        b, h, w, c = image.shape
    hp, wp = _round_up(h, TH), _round_up(w, LANE)       # source staging
    if abs_pos:  # flow = absolute (sx, sy) on a decoupled output grid
        ho, wo = (flow.shape[1], flow.shape[3]) if planar else (
            flow.shape[1], flow.shape[2])
    else:
        ho, wo = h, w
    hp_o, wp_o = _round_up(ho, TH), _round_up(wo, LANE)  # output grid
    nt_w = wp_o // LANE
    c2 = (c + 1) // 2
    if c % 2:
        zpad = (image[:, :, :1, :] if planar else image[..., :1])
        image = jnp.concatenate(
            [image, jnp.zeros_like(zpad)], axis=2 if planar else -1
        )

    fx, fy = _flow_xy(flow, planar)
    if abs_pos:
        sx, sy = fx, fy
    else:
        gy = lax.broadcasted_iota(jnp.float32, (ho, wo), 0)
        gx = lax.broadcasted_iota(jnp.float32, (ho, wo), 1)
        sx = gx[None] + fx
        sy = gy[None] + fy
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    alpha = jnp.clip(sx - x0.astype(jnp.float32), 0.0, 1.0)
    beta = jnp.clip(sy - y0.astype(jnp.float32), 0.0, 1.0)

    def pad2(x, val=0):
        return jnp.pad(
            x, ((0, 0), (0, hp - x.shape[1]), (0, wp - x.shape[2])),
            constant_values=val,
        )

    # channel pairs -> i32 words via per-plane shifts (little-endian,
    # identical to bitcasting bf16[2]; avoids the feature-minor lane-padded
    # intermediate the vector bitcast forces); planes (B*C2, Hp, Wp)
    def _chan_u16(ci):
        plane = image[:, :, ci, :] if planar else image[..., ci]
        pl16 = lax.bitcast_convert_type(
            plane.astype(jnp.bfloat16), jnp.uint16
        )
        return pl16.astype(jnp.int32)

    words = jnp.stack(
        [
            _chan_u16(2 * k) | (_chan_u16(2 * k + 1) << 16)
            for k in range(c2)
        ],
        axis=1,
    )  # (B, C2, H, W)
    # EDGE-pad the index/weight operands: zero-padding poisons the padded
    # columns' y0/x0 with 0, dragging every window's dynamic band/tile range
    # down to the frame origin — at widths that aren't lane multiples (e.g.
    # the 1088-wide transposed TTA group) the last window of every stripe
    # then walks the whole frame (measured 10x: 171 ms vs 17 ms at B=4).
    # Padded outputs are garbage and cropped; only the ranges matter.
    def pad2_edge(x):
        return jnp.pad(
            x, ((0, 0), (0, hp_o - x.shape[1]), (0, wp_o - x.shape[2])),
            mode="edge",
        )

    operands = [pad2_edge(v) for v in (y0, x0, alpha, beta)]
    img_spec = pl.BlockSpec(memory_space=pl.ANY)

    import os

    # group-size sweep (tools/warp_mc_sweep.py, v2 ctx shapes): monotone
    # improvement up to 16 words (C=32 @544x960: pair 39.1 -> 22.7 ms;
    # C=64 @272x480: 21.0 -> 9.9 ms); 32 accumulator vregs still fit
    gs_max = int(os.environ.get("RIFE_TPU_WARP_MC_GS", "16"))
    gs = 1
    for cand in (16, 8, 4, 2):
        if cand <= gs_max and c2 % cand == 0:
            gs = cand if c2 > cand else c2
            break
    if gs >= 2:
        # multi-channel shared-index kernel: one stripe pass serves all
        # channel words; group size bounds live accumulators (2*gs vregs)
        n_g = c2 // gs
        wordsg = pad2(words.reshape(b * c2, h, w)).reshape(b, c2, hp, wp)
        grid = (b, n_g, hp_o // TH)
        idx_spec = pl.BlockSpec(
            (1, TH, wp_o), lambda i, g, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (1, gs, TH, wp_o), lambda i, g, j: (i, g, j, 0),
            memory_space=pltpu.VMEM,
        )
        # tall form default: measured faster at both ctx shapes (C=32
        # @544x960: 22.0 -> 19.5 ms; C=64 @272x480: 9.95 -> 8.63)
        mc_kernel = (
            _warp_kernel_packed_mct
            if os.environ.get("RIFE_TPU_WARP_MC_TALL", "1") != "0"
            else _warp_kernel_packed_mc
        )
        out0, out1 = pl.pallas_call(
            functools.partial(
                mc_kernel, gs=gs, nt_w=nt_w,
                h_max=h - 1, w_max=w - 1,
            ),
            grid=grid,
            in_specs=[img_spec] + [idx_spec] * 4,
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((b, c2, hp_o, wp_o), jnp.float32),
                jax.ShapeDtypeStruct((b, c2, hp_o, wp_o), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((gs, TH, wp), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(wordsg, *operands)
        out0 = out0.reshape(b * c2, hp_o, wp_o)
        out1 = out1.reshape(b * c2, hp_o, wp_o)
    else:
        words = pad2(words.reshape(b * c2, h, w))
        grid = (b * c2, hp_o // TH)
        stripe = lambda i, j: (i // c2, j, 0)  # noqa: E731
        idx_spec = pl.BlockSpec(
            (1, TH, wp_o), stripe, memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, TH, wp_o), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        out0, out1 = pl.pallas_call(
            functools.partial(
                _warp_kernel_packed, nt_w=nt_w, h_max=h - 1, w_max=w - 1
            ),
            grid=grid,
            in_specs=[img_spec] + [idx_spec] * 4,
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((b * c2, hp_o, wp_o), jnp.float32),
                jax.ShapeDtypeStruct((b * c2, hp_o, wp_o), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((hp, wp), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(words, *operands)

    if planar:
        # BHCW out: channel pairs (2k, 2k+1) interleave on the C axis
        o0 = out0[:, :ho, :wo].reshape(b, c2, ho, wo).transpose(0, 2, 1, 3)
        o1 = out1[:, :ho, :wo].reshape(b, c2, ho, wo).transpose(0, 2, 1, 3)
        out = jnp.stack([o0, o1], axis=3).reshape(b, ho, 2 * c2, wo)
        return out[:, :, :c, :].astype(image.dtype)
    out = jnp.stack([out0, out1], axis=-1)  # (B*C2, Hpo, Wpo, 2)
    out = out[:, :ho, :wo, :].reshape(b, c2, ho, wo, 2)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, ho, wo, 2 * c2)
    return out[..., :c].astype(image.dtype)


def _warp_kernel_u8(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                    o0_ref, o1_ref, o2_ref, img_ref, sem, *,
                    nt_w: int, h_max: int, w_max: int):
    """u8-quad variant: one i32 gather word carries FOUR u8 channels
    (RGB + pad), so a single (x0, x1) gather pair serves the whole pixel and
    the band/mask algebra runs once per pixel instead of once per channel
    pair.  Used for warp inputs that are value-copies of the u8-origin
    input frames (Split closure, ``Graph.value_copies_of``) — for those,
    ``round(v*255)`` is the exact original u8, so packing is lossless.

    y1/x1 are recomputed as min(+1, limit) in-kernel instead of shipped as
    operands: they differ from the shader's clip(floor+1) only where the
    corresponding bilinear weight is exactly zero (alpha/beta clamp to 0/1
    out of range), so results are identical and two full-resolution index
    planes of HBM traffic disappear.  Outputs are written in the image
    dtype with the /255 normalization folded in (one rounding, same as the
    XLA epilogue it replaces)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        cp = pltpu.make_async_copy(img_hbm.at[pl.program_id(0)], img_ref, sem)
        cp.start()
        cp.wait()

    for lo in range(nt_w):
        sl = pl.ds(lo * LANE, LANE)
        y0 = y0_ref[0, :, sl]
        x0 = x0_ref[0, :, sl]
        y1 = jnp.minimum(y0 + 1, h_max)
        x1 = jnp.minimum(x0 + 1, w_max)
        alpha = a_ref[0, :, sl]
        beta = b_ref[0, :, sl]
        w00 = (1.0 - alpha) * (1.0 - beta)
        w01 = alpha * (1.0 - beta)
        w10 = (1.0 - alpha) * beta
        w11 = alpha * beta

        band_lo = jnp.min(y0) // TH
        band_hi = jnp.max(y1) // TH
        t_lo = jnp.min(x0) // LANE
        t_hi = jnp.max(x1) // LANE
        # NB: computing per-band x-tile bounds (masked min/max per band) was
        # measured SLOWER on v5e — two masked cross-lane reductions per band
        # cost more than the 0-1 tiles they skip.

        def unpack3(g):
            c0 = (g & 0xFF).astype(jnp.float32)
            c1 = ((g >> 8) & 0xFF).astype(jnp.float32)
            # byte 3 is zero by construction (u8 packing gated to <=3 ch)
            c2 = (g >> 16).astype(jnp.float32)
            return c0, c1, c2

        def band_body(band, accs):
            def tile_body(t, accs):
                a0, a1, a2 = accs
                chunk = img_ref[
                    pl.ds(pl.multiple_of(band * TH, TH), TH),
                    pl.ds(t * LANE, LANE),
                ]
                lx0 = x0 - t * LANE
                lx1 = x1 - t * LANE
                ok0 = (lx0 >= 0) & (lx0 < LANE)
                ok1 = (lx1 >= 0) & (lx1 < LANE)
                lx0c = jnp.clip(lx0, 0, LANE - 1)
                lx1c = jnp.clip(lx1, 0, LANE - 1)
                zero = jnp.zeros_like(w00)
                for k in range(TH):
                    r = band * TH + k
                    m_y0 = (y0 == r)
                    m_y1 = (y1 == r)
                    tile = jnp.broadcast_to(chunk[k : k + 1, :], (TH, LANE))
                    g0 = jnp.take_along_axis(tile, lx0c, axis=1)
                    g1 = jnp.take_along_axis(tile, lx1c, axis=1)
                    wg0 = (
                        jnp.where(m_y0 & ok0, w00, zero)
                        + jnp.where(m_y1 & ok0, w10, zero)
                    )
                    wg1 = (
                        jnp.where(m_y0 & ok1, w01, zero)
                        + jnp.where(m_y1 & ok1, w11, zero)
                    )
                    r0, g0c, b0 = unpack3(g0)
                    r1, g1c, b1 = unpack3(g1)
                    a0 = a0 + r0 * wg0 + r1 * wg1
                    a1 = a1 + g0c * wg0 + g1c * wg1
                    a2 = a2 + b0 * wg0 + b1 * wg1
                return (a0, a1, a2)

            return lax.fori_loop(t_lo, t_hi + 1, tile_body, accs)

        zeros = jnp.zeros((TH, LANE), jnp.float32)
        a0, a1, a2 = lax.fori_loop(
            band_lo, band_hi + 1, band_body, (zeros, zeros, zeros)
        )
        scale = jnp.float32(1.0 / 255.0)
        o0_ref[0, :, sl] = (a0 * scale).astype(o0_ref.dtype)
        o1_ref[0, :, sl] = (a1 * scale).astype(o1_ref.dtype)
        o2_ref[0, :, sl] = (a2 * scale).astype(o2_ref.dtype)


def _warp_kernel_u8_delta(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                          o0_ref, o1_ref, o2_ref, img_ref, sem, *,
                          nt_w: int, h_max: int, w_max: int):
    """u8-quad DELTA-ROLL variant — the smooth-flow fast path.

    The band kernel iterates source row-BANDS and matches each of a band's 8
    rows against the stripe one-hot-style, so its row-iteration count is
    ``(ceil(spread/8)+1) * 8`` even when the stripe's y-spread is 2.  This
    kernel iterates the row DELTA ``d = y0 - (stripe_row)`` instead: for
    each d it builds the diagonal 8-row window ``W[s] = img[Y+s+d]`` (two
    aligned band loads + one dynamic sublane roll) and serves all 8 output
    sublanes with ONE per-sublane lane-gather, so the iteration count is the
    exact y-spread + 2.  At the smooth flows real RIFE weights produce
    (spread ~2-6 rows/stripe) that is a ~2-4x reduction; at adversarial
    white-noise flows it degrades to parity with the band kernel.

    The image is staged into VMEM with an 8-row offset on top (and 16 rows
    of slack at the bottom) so the two aligned 8-row loads around any needed
    window stay in-bounds even at the frame borders; border contributions
    read garbage rows there but their bilinear weights are exactly zero
    (y0/y1 are clamped, so no element maps outside [0, h-1])."""
    hp_pad = img_ref.shape[0]  # staged height = 8 + hp + slack

    @pl.when(pl.program_id(1) == 0)
    def _():
        cp = pltpu.make_async_copy(
            img_hbm.at[pl.program_id(0)],
            img_ref.at[pl.ds(TH, img_hbm.shape[1])],
            sem,
        )
        cp.start()
        cp.wait()

    base_y = pl.program_id(1) * TH

    def unpack3(g):
        c0 = (g & 0xFF).astype(jnp.float32)
        c1 = ((g >> 8) & 0xFF).astype(jnp.float32)
        # byte 3 is zero by construction (u8 packing is gated to <=3
        # channels), so the top shift needs no mask
        c2 = (g >> 16).astype(jnp.float32)
        return c0, c1, c2

    srow = lax.broadcasted_iota(jnp.int32, (TH, LANE), 0) + base_y

    for lo in range(nt_w):
        sl = pl.ds(lo * LANE, LANE)
        y0 = y0_ref[0, :, sl]
        x0 = x0_ref[0, :, sl]
        y1 = jnp.minimum(y0 + 1, h_max)
        x1 = jnp.minimum(x0 + 1, w_max)
        alpha = a_ref[0, :, sl]
        beta = b_ref[0, :, sl]
        w00 = (1.0 - alpha) * (1.0 - beta)
        w01 = alpha * (1.0 - beta)
        w10 = (1.0 - alpha) * beta
        w11 = alpha * beta

        d0 = y0 - srow
        d1 = y1 - srow
        d_lo = jnp.min(d0)
        d_hi = jnp.max(d1)
        t_lo = jnp.min(x0) // LANE
        t_hi = jnp.max(x1) // LANE

        def delta_body(d, accs):
            # window rows img[base_y+d .. base_y+d+7] live at staged rows
            # base+8..base+15; load the two aligned bands around them and
            # roll so W[s] = img[base_y + s + d]
            staged = base_y + d + TH
            b0 = (staged // TH) * TH
            off = staged - b0

            def tile_body(t, accs):
                a0, a1, a2 = accs
                ab = img_ref[
                    pl.ds(pl.multiple_of(b0, TH), 2 * TH),
                    pl.ds(t * LANE, LANE),
                ]
                w16 = pltpu.roll(ab, shift=-off, axis=0)
                win = w16[:TH, :]
                lx0 = x0 - t * LANE
                lx1 = x1 - t * LANE
                ok0 = (lx0 >= 0) & (lx0 < LANE)
                ok1 = (lx1 >= 0) & (lx1 < LANE)
                lx0c = jnp.clip(lx0, 0, LANE - 1)
                lx1c = jnp.clip(lx1, 0, LANE - 1)
                zero = jnp.zeros_like(w00)
                m0 = (d0 == d)
                m1 = (d1 == d)
                g0 = jnp.take_along_axis(win, lx0c, axis=1)
                g1 = jnp.take_along_axis(win, lx1c, axis=1)
                wg0 = (
                    jnp.where(m0 & ok0, w00, zero)
                    + jnp.where(m1 & ok0, w10, zero)
                )
                wg1 = (
                    jnp.where(m0 & ok1, w01, zero)
                    + jnp.where(m1 & ok1, w11, zero)
                )
                r0, g0c, b0c = unpack3(g0)
                r1, g1c, b1c = unpack3(g1)
                a0 = a0 + r0 * wg0 + r1 * wg1
                a1 = a1 + g0c * wg0 + g1c * wg1
                a2 = a2 + b0c * wg0 + b1c * wg1
                return (a0, a1, a2)

            return lax.fori_loop(t_lo, t_hi + 1, tile_body, accs)

        zeros = jnp.zeros((TH, LANE), jnp.float32)
        a0, a1, a2 = lax.fori_loop(
            d_lo, d_hi + 1, delta_body, (zeros, zeros, zeros)
        )
        scale = jnp.float32(1.0 / 255.0)
        o0_ref[0, :, sl] = (a0 * scale).astype(o0_ref.dtype)
        o1_ref[0, :, sl] = (a1 * scale).astype(o1_ref.dtype)
        o2_ref[0, :, sl] = (a2 * scale).astype(o2_ref.dtype)
    del hp_pad


def _slab_tall_body(img_hbm, y0_full, x0_full, a_full, b_full,
                    o0_ref, o1_ref, o2_ref,
                    slab, acc0, acc1, acc2, sem, *,
                    nt_w: int, h_max: int, w_max: int, ns: int = 1):
    """Shared body of the TALL slab kernel.  ``y0_full``/``x0_full`` (i32)
    and ``a_full``/``b_full`` (f32) are VALUES of shape (ns*TH, wp_o) —
    either loaded from precomputed operand refs or computed in-kernel from
    the flow (the inflow variant).

    ``ns`` output stripes share one grid cell and ONE band loop: each
    source band is DMA'd once and serves every covered stripe.  Why: at
    ns=1 the grid is B x (H/8) = 3,264 cells for the B=24 1080p step, and
    the ~6 us Mosaic per-cell fixed cost (prologue, DMA setup, loop
    scaffolding) alone is ~20 ms per warp — the measured empty-range floor.
    Coarsening to ns stripes divides that fixed cost by ns and dedupes the
    band DMAs that adjacent stripes of a smooth flow share (band range per
    stripe ~spread+1; union over ns stripes ~spread+ns)."""
    _slab_tall_accumulate(
        img_hbm, y0_full, x0_full, a_full, b_full,
        slab, acc0, acc1, acc2, sem,
        nt_w=nt_w, h_max=h_max, w_max=w_max, ns=ns,
    )
    scale = jnp.float32(1.0 / 255.0)
    o0_ref[0] = (acc0[...] * scale).astype(o0_ref.dtype)
    o1_ref[0] = (acc1[...] * scale).astype(o1_ref.dtype)
    o2_ref[0] = (acc2[...] * scale).astype(o2_ref.dtype)


def _slab_tall_accumulate(img_hbm, y0_full, x0_full, a_full, b_full,
                          slab, acc0, acc1, acc2, sem, *,
                          nt_w: int, h_max: int, w_max: int, ns: int = 1):
    """Band-walking accumulation core of the TALL slab kernel: zeroes the
    three f32 accumulators, streams the referenced source bands and leaves
    the 255-scaled channel sums in ``acc0..2``.  Factored out so the PAIR
    kernels (one pallas_call, two warps — the per-cell fixed cost and the
    accumulator/slab scratch are paid once for both) can run it twice."""
    zeros_row = jnp.zeros(acc0.shape, jnp.float32)
    acc0[...] = zeros_row
    acc1[...] = zeros_row
    acc2[...] = zeros_row

    # per-(stripe, window) iteration ranges + per-stripe band ranges
    ranges = []
    stripe_bands = []
    for s in range(ns):
        rs = slice(s * TH, (s + 1) * TH)
        y0s = y0_full[rs]
        srange = []
        for lo in range(nt_w):
            sl = slice(lo * LANE, (lo + 1) * LANE)
            y0 = y0s[:, sl]
            x0 = x0_full[rs, sl]
            srange.append((
                jnp.min(y0) // TH,
                jnp.max(jnp.minimum(y0 + 1, h_max)) // TH,
                jnp.min(x0) // LANE,
                jnp.max(jnp.minimum(x0 + 1, w_max)) // LANE,
            ))
        ranges.append(srange)
        stripe_bands.append((
            jnp.min(y0s) // TH,
            jnp.max(jnp.minimum(y0s + 1, h_max)) // TH,
        ))

    band_lo = jnp.min(y0_full) // TH
    band_hi = jnp.max(jnp.minimum(y0_full + 1, h_max)) // TH

    def unpack3(g):
        c0 = (g & 0xFF).astype(jnp.float32)
        c1 = ((g >> 8) & 0xFF).astype(jnp.float32)
        # byte 3 is zero by construction (u8 packing is gated to <=3
        # channels), so the top shift needs no mask
        c2 = (g >> 16).astype(jnp.float32)
        return c0, c1, c2

    def tall(v):  # (TH, LANE) -> (TH*TH, LANE): same window data per block
        return jnp.broadcast_to(v[None], (TH, TH, LANE)).reshape(
            TH * TH, LANE)

    # block k of the tall layout handles source row band*TH + k
    k_of = lax.broadcasted_iota(jnp.int32, (TH * TH, LANE), 0) // TH

    def band_body(band, carry):
        cp = pltpu.make_async_copy(
            img_hbm.at[
                pl.program_id(0),
                pl.ds(pl.multiple_of(band * TH, TH), TH),
                :,
            ],
            slab,
            sem,
        )
        cp.start()
        cp.wait()
        r_tall = band * TH + k_of

        def stripe_windows(s, rs):
            for lo in range(nt_w):
                blo, bhi, t_lo, t_hi = ranges[s][lo]

                @pl.when((band >= blo) & (band <= bhi))
                def _(rs=rs, lo=lo, t_lo=t_lo, t_hi=t_hi):
                    sl = slice(lo * LANE, (lo + 1) * LANE)
                    y0 = y0_full[rs, sl]
                    x0 = x0_full[rs, sl]
                    y1 = jnp.minimum(y0 + 1, h_max)
                    x1 = jnp.minimum(x0 + 1, w_max)
                    alpha = a_full[rs, sl]
                    beta = b_full[rs, sl]
                    w00t = tall((1.0 - alpha) * (1.0 - beta))
                    w01t = tall(alpha * (1.0 - beta))
                    w10t = tall((1.0 - alpha) * beta)
                    w11t = tall(alpha * beta)
                    m0 = (tall(y0) == r_tall)
                    m1 = (tall(y1) == r_tall)
                    zero = jnp.zeros_like(w00t)

                    def tile_body(t, accs):
                        a0v, a1v, a2v = accs
                        chunk = slab[:, pl.ds(t * LANE, LANE)]
                        # row k repeated over the 8 output sublanes per block
                        tile64 = jnp.broadcast_to(
                            chunk[:, None, :], (TH, TH, LANE)
                        ).reshape(TH * TH, LANE)
                        lx0 = x0 - t * LANE
                        lx1 = x1 - t * LANE
                        ok0 = tall((lx0 >= 0) & (lx0 < LANE))
                        ok1 = tall((lx1 >= 0) & (lx1 < LANE))
                        idx0 = tall(jnp.clip(lx0, 0, LANE - 1))
                        idx1 = tall(jnp.clip(lx1, 0, LANE - 1))
                        g0 = jnp.take_along_axis(tile64, idx0, axis=1)
                        g1 = jnp.take_along_axis(tile64, idx1, axis=1)
                        wg0 = (
                            jnp.where(m0 & ok0, w00t, zero)
                            + jnp.where(m1 & ok0, w10t, zero)
                        )
                        wg1 = (
                            jnp.where(m0 & ok1, w01t, zero)
                            + jnp.where(m1 & ok1, w11t, zero)
                        )
                        r0, g0c, b0c = unpack3(g0)
                        r1, g1c, b1c = unpack3(g1)
                        c0 = (r0 * wg0 + r1 * wg1).reshape(TH, TH, LANE)
                        c1 = (g0c * wg0 + g1c * wg1).reshape(TH, TH, LANE)
                        c2 = (b0c * wg0 + b1c * wg1).reshape(TH, TH, LANE)
                        return (a0v + c0.sum(0), a1v + c1.sum(0),
                                a2v + c2.sum(0))

                    a0v, a1v, a2v = lax.fori_loop(
                        t_lo, t_hi + 1, tile_body,
                        (acc0[rs, sl], acc1[rs, sl], acc2[rs, sl]),
                    )
                    acc0[rs, sl] = a0v
                    acc1[rs, sl] = a1v
                    acc2[rs, sl] = a2v

        for s in range(ns):
            sb_lo, sb_hi = stripe_bands[s]

            # stripe-level guard: a band outside this stripe's source range
            # skips all nt_w window predicates at once
            @pl.when((band >= sb_lo) & (band <= sb_hi))
            def _(s=s):
                stripe_windows(s, slice(s * TH, (s + 1) * TH))

        return carry

    lax.fori_loop(band_lo, band_hi + 1, band_body, 0)


def _slab_sheared_accumulate(img_hbm, y0_full, x0_full, a_full, b_full,
                             slab, acc0, acc1, acc2, sem, *,
                             nt_w: int, h_max: int, w_max: int, nb: int,
                             ts: int = TH):
    """SHEARED accumulation core: dy-walk gathering over chunked slab
    staging — the sdelta idea (iterate the integer row-delta range, which
    for smooth flows is the exact per-window y-spread ~2-4 values, instead
    of one-hot-matching every row of every touched 8-aligned band) rebuilt
    on the round-4 inflow/pair structure (in-kernel ranges, no SMEM tables,
    no materialized position operands).

    Work model vs `_slab_tall_accumulate`: the tall kernel pays gather +
    unpack + select on a (8*TH, LANE) tall layout for every (band, tile)
    visit (~2 bands x ~2 tiles per window at smooth flows), touching 8
    candidate rows per visit of which ~2 contribute.  This kernel pays
    (8, LANE)-sized work per (tile, dy) visit with dy covering exactly
    [min(y0-row), max(y1-row)] — typically (spread+2) x ~2 tiles visits —
    so ~3-4x less VPU work at the measured per-stripe y-spread of 2.3-2.8
    rows (BASELINE.md round-3 attribution).

    Staging: the slab scratch holds ``nb`` 8-row source bands.  Chunk k
    stages bands [cb0 + k(nb-1), +nb) and serves every dy whose 8-row
    sheared window starts inside the first nb-1 staged bands (the window
    may extend into the nb-th — that's why one extra band is staged).
    Rough flows simply take more chunks — correctness never depends on a
    spread bound, unlike a fixed-slab design.  A dy window's rows are cut
    out of the staged block with one dynamic sublane roll (the sdelta
    mechanism, /root/repo lineage: _warp_kernel_u8_sdelta).

    Per-element contribution order matches the tall kernel's same-band
    case (the overwhelmingly common one at smooth flows): per tile, both
    row corners accumulate into a per-tile partial sum in ascending row
    order, and partial sums join the accumulator in ascending tile order.
    Reference algebra: /root/reference/src/warp.comp:42-63.

    ``ts`` is the OUTPUT STRIPE height this grid step covers (a multiple
    of TH).  Taller stripes amortize the per-step fixed costs — corners
    chain, window min/max, fori_loop scalar bookkeeping, output DMA —
    over 4-8x more pixels while the per-pixel gather work stays constant
    (smooth flows vary little over 32-64 rows, so the dy span per window
    barely grows)."""
    assert ts % TH == 0 and nb * TH >= 2 * ts
    zeros_row = jnp.zeros(acc0.shape, jnp.float32)
    acc0[...] = zeros_row
    acc1[...] = zeros_row
    acc2[...] = zeros_row

    base_y = pl.program_id(1) * ts
    n_src_bands = img_hbm.shape[1] // TH
    # a chunk staging nb bands serves window-start offsets [0, cap) —
    # the ts-row sheared window [off, off+ts) must fit the staged block
    cap = nb * TH - ts
    stride_bands = nb - ts // TH

    def unpack3(g):
        c0 = (g & 0xFF).astype(jnp.float32)
        c1 = ((g >> 8) & 0xFF).astype(jnp.float32)
        # byte 3 is zero by construction (u8 packing is gated to <=3
        # channels), so the top shift needs no mask
        c2 = (g >> 16).astype(jnp.float32)
        return c0, c1, c2

    srow_l = lax.broadcasted_iota(jnp.int32, (ts, LANE), 0)

    # per-window dy/tile ranges (in-kernel cross-lane reductions — the SMEM
    # table alternative costs full-image XLA reduction passes per warp,
    # measured net-negative in BASELINE.md round-3)
    wins = []
    d_lo_g = None
    d_hi_g = None
    for lo in range(nt_w):
        sl = slice(lo * LANE, (lo + 1) * LANE)
        y0 = y0_full[:, sl]
        x0 = x0_full[:, sl]
        y1 = jnp.minimum(y0 + 1, h_max)
        x1 = jnp.minimum(x0 + 1, w_max)
        dys0 = y0 - srow_l - base_y
        dys1 = y1 - srow_l - base_y
        d_lo = jnp.min(dys0)
        d_hi = jnp.max(dys1)
        t_lo = jnp.min(x0) // LANE
        t_hi = jnp.max(x1) // LANE
        wins.append((d_lo, d_hi, t_lo, t_hi))
        d_lo_g = d_lo if d_lo_g is None else jnp.minimum(d_lo_g, d_lo)
        d_hi_g = d_hi if d_hi_g is None else jnp.maximum(d_hi_g, d_hi)

    # chunk walk: window start rows rw = base_y + dy span
    # [base_y + d_lo_g, base_y + d_hi_g]; chunk k serves starts in bands
    # [cb0 + k*stride_bands, cb0 + (k+1)*stride_bands)
    cb0 = (base_y + d_lo_g) // TH
    span_bands = (base_y + d_hi_g) // TH - cb0 + 1
    n_chunks = (span_bands + stride_bands - 1) // stride_bands

    def chunk_body(k, carry):
        cb = cb0 + k * stride_bands
        in_range = (cb >= 0) & (cb + nb <= n_src_bands)

        @pl.when(in_range)
        def _():
            cp = pltpu.make_async_copy(
                img_hbm.at[
                    pl.program_id(0),
                    pl.ds(pl.multiple_of(cb * TH, TH), nb * TH),
                    :,
                ],
                slab,
                sem,
            )
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_not(in_range))
        def _():
            # frame-edge chunk: stage the in-bounds bands one by one;
            # un-staged slab rows keep stale (finite) words whose bilinear
            # weights are exactly zero (y0/y1 are clamped to [0, h-1])
            for q in range(nb):
                sb = cb + q

                @pl.when((sb >= 0) & (sb < n_src_bands))
                def _(sb=sb, q=q):
                    cp = pltpu.make_async_copy(
                        img_hbm.at[
                            pl.program_id(0),
                            pl.ds(pl.multiple_of(sb * TH, TH), TH),
                            :,
                        ],
                        slab.at[pl.ds(q * TH, TH)],
                        sem,
                    )
                    cp.start()
                    cp.wait()

        c_lo = cb * TH - base_y  # lowest dy this chunk can serve
        for lo in range(nt_w):
            d_lo_w, d_hi_w, t_lo, t_hi = wins[lo]
            dd_lo = jnp.maximum(d_lo_w, c_lo)
            dd_hi = jnp.minimum(d_hi_w, c_lo + cap - 1)

            @pl.when(dd_lo <= dd_hi)
            def _(lo=lo, dd_lo=dd_lo, dd_hi=dd_hi, t_lo=t_lo, t_hi=t_hi,
                  c_lo=c_lo):
                sl = slice(lo * LANE, (lo + 1) * LANE)
                y0 = y0_full[:, sl]
                x0 = x0_full[:, sl]
                y1 = jnp.minimum(y0 + 1, h_max)
                x1 = jnp.minimum(x0 + 1, w_max)
                alpha = a_full[:, sl]
                beta = b_full[:, sl]
                w00 = (1.0 - alpha) * (1.0 - beta)
                w01 = alpha * (1.0 - beta)
                w10 = (1.0 - alpha) * beta
                w11 = alpha * beta
                dys0 = y0 - srow_l - base_y
                dys1 = y1 - srow_l - base_y
                zero = jnp.zeros_like(w00)

                def tile_body(t, accs):
                    a0v, a1v, a2v = accs
                    block = slab[:, pl.ds(t * LANE, LANE)]
                    lx0 = x0 - t * LANE
                    lx1 = x1 - t * LANE
                    ok0 = (lx0 >= 0) & (lx0 < LANE)
                    ok1 = (lx1 >= 0) & (lx1 < LANE)
                    idx0 = jnp.clip(lx0, 0, LANE - 1)
                    idx1 = jnp.clip(lx1, 0, LANE - 1)

                    def dy_body(dy, part):
                        s0, s1, s2 = part
                        off = dy - c_lo
                        win = pltpu.roll(block, shift=-off, axis=0)[:ts, :]
                        g0 = jnp.take_along_axis(win, idx0, axis=1)
                        g1 = jnp.take_along_axis(win, idx1, axis=1)
                        m0 = dys0 == dy
                        m1 = dys1 == dy
                        wg0 = (
                            jnp.where(m0 & ok0, w00, zero)
                            + jnp.where(m1 & ok0, w10, zero)
                        )
                        wg1 = (
                            jnp.where(m0 & ok1, w01, zero)
                            + jnp.where(m1 & ok1, w11, zero)
                        )
                        r0, g0c, b0c = unpack3(g0)
                        r1, g1c, b1c = unpack3(g1)
                        return (s0 + (r0 * wg0 + r1 * wg1),
                                s1 + (g0c * wg0 + g1c * wg1),
                                s2 + (b0c * wg0 + b1c * wg1))

                    zp = jnp.zeros_like(zero)
                    p0, p1, p2 = lax.fori_loop(
                        dd_lo, dd_hi + 1, dy_body, (zp, zp, zp))
                    return (a0v + p0, a1v + p1, a2v + p2)

                a0v, a1v, a2v = lax.fori_loop(
                    t_lo, t_hi + 1, tile_body,
                    (acc0[:, sl], acc1[:, sl], acc2[:, sl]),
                )
                acc0[:, sl] = a0v
                acc1[:, sl] = a1v
                acc2[:, sl] = a2v

        return carry

    lax.fori_loop(0, n_chunks, chunk_body, 0)


def _warp_kernel_u8_sheared_flow_pair(
        img_a_hbm, img_b_hbm, sxa_ref, sya_ref, sxb_ref, syb_ref,
        oa0, oa1, oa2, ob0, ob1, ob2,
        slab, acc0, acc1, acc2, sem, *,
        nt_w: int, h_max: int, w_max: int, nb: int, ts: int = TH,
        raw_flow: bool = False):
    """PAIR kernel on the sheared accumulate core — drop-in alternative to
    `_warp_kernel_u8_slab_tall_flow_pair` (same operands, same outputs,
    dy-walk gathering instead of band-tall one-hot)."""
    scale = jnp.float32(1.0 / 255.0)
    ya, xa, aa, ba = _inkernel_corners(sxa_ref, sya_ref, h_max=h_max,
                                       w_max=w_max, raw_flow=raw_flow)
    _slab_sheared_accumulate(img_a_hbm, ya, xa, aa, ba,
                             slab, acc0, acc1, acc2, sem,
                             nt_w=nt_w, h_max=h_max, w_max=w_max, nb=nb,
                             ts=ts)
    oa0[0] = (acc0[...] * scale).astype(oa0.dtype)
    oa1[0] = (acc1[...] * scale).astype(oa1.dtype)
    oa2[0] = (acc2[...] * scale).astype(oa2.dtype)
    yb, xb, ab, bb = _inkernel_corners(sxb_ref, syb_ref, h_max=h_max,
                                       w_max=w_max, raw_flow=raw_flow)
    _slab_sheared_accumulate(img_b_hbm, yb, xb, ab, bb,
                             slab, acc0, acc1, acc2, sem,
                             nt_w=nt_w, h_max=h_max, w_max=w_max, nb=nb,
                             ts=ts)
    ob0[0] = (acc0[...] * scale).astype(ob0.dtype)
    ob1[0] = (acc1[...] * scale).astype(ob1.dtype)
    ob2[0] = (acc2[...] * scale).astype(ob2.dtype)


def _warp_kernel_u8_sheared_flow_render(
        img_m_hbm, img_i_hbm, sxm_ref, sym_ref, sxi_ref, syi_ref, mask_ref,
        o0, o1, o2,
        slab, acc0, acc1, acc2, st0, st1, st2, sem, *,
        nt_w: int, h_max: int, w_max: int, nb: int, ts: int = TH,
        raw_flow: bool = False):
    """RENDER (pair + in-kernel mask blend) on the sheared accumulate core
    — drop-in alternative to `_warp_kernel_u8_slab_tall_flow_render`."""
    scale = jnp.float32(1.0 / 255.0)
    ym, xm, am, bm = _inkernel_corners(sxm_ref, sym_ref, h_max=h_max,
                                       w_max=w_max, raw_flow=raw_flow)
    _slab_sheared_accumulate(img_m_hbm, ym, xm, am, bm,
                             slab, acc0, acc1, acc2, sem,
                             nt_w=nt_w, h_max=h_max, w_max=w_max, nb=nb,
                             ts=ts)
    st0[...] = (acc0[...] * scale).astype(st0.dtype)
    st1[...] = (acc1[...] * scale).astype(st1.dtype)
    st2[...] = (acc2[...] * scale).astype(st2.dtype)
    yi, xi, ai, bi = _inkernel_corners(sxi_ref, syi_ref, h_max=h_max,
                                       w_max=w_max, raw_flow=raw_flow)
    _slab_sheared_accumulate(img_i_hbm, yi, xi, ai, bi,
                             slab, acc0, acc1, acc2, sem,
                             nt_w=nt_w, h_max=h_max, w_max=w_max, nb=nb,
                             ts=ts)
    m = mask_ref[0]
    one = jnp.asarray(1.0, m.dtype)
    o0[0] = st0[...] * m + (acc0[...] * scale).astype(o0.dtype) * (one - m)
    o1[0] = st1[...] * m + (acc1[...] * scale).astype(o1.dtype) * (one - m)
    o2[0] = st2[...] * m + (acc2[...] * scale).astype(o2.dtype) * (one - m)


def _inkernel_corners(sx_ref, sy_ref, *, h_max: int, w_max: int,
                      raw_flow: bool = False):
    """floor/clip index+fraction chain from the flow operands — the exact
    f32 op sequence of the XLA driver (bit-identical).

    ``raw_flow=False``: the refs hold absolute sample positions (f32).
    ``raw_flow=True``: the refs hold the RAW flow planes in their graph
    dtype (bf16) — the kernel adds the output-grid iota itself (f32 iota +
    f32(flow), the driver's own op order), so the driver never materializes
    the two full-resolution f32 position planes per warp (8 B/px written +
    read back, plus an edge-pad pass — ~2 GB of HBM round-trip per warp
    pair at B=30 1080p).  Zero-padded flow columns/rows decode to identity
    positions (sample = own pixel), which keeps every window's dynamic
    band/tile range benign — unlike zero-padded INDEX operands, which drag
    ranges to the frame origin (see pad2_edge in the driver)."""
    if raw_flow:
        fx = sx_ref[0].astype(jnp.float32)
        fy = sy_ref[0].astype(jnp.float32)
        # integer iota (Mosaic's tpu.iota is int-only), exact f32 converts
        rows0 = pl.program_id(1) * fx.shape[0]
        gy = (lax.broadcasted_iota(jnp.int32, fx.shape, 0) + rows0).astype(
            jnp.float32)
        gx = lax.broadcasted_iota(jnp.int32, fx.shape, 1).astype(jnp.float32)
        sx = gx + fx
        sy = gy + fy
    else:
        sx = sx_ref[0]
        sy = sy_ref[0]
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w_max)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h_max)
    alpha = jnp.clip(sx - x0.astype(jnp.float32), 0.0, 1.0)
    beta = jnp.clip(sy - y0.astype(jnp.float32), 0.0, 1.0)
    return y0, x0, alpha, beta


def _ds4_tap_corners(fx_ref, fy_ref, *, ta: int, tb: int,
                     h_max: int, w_max: int, ts: int):
    """In-kernel corner chain for ONE tap quadrant of the fused
    warp-then-1/4-downscale grid (jax_ops._ds4_abs_positions): final-grid
    pixel (i, j) samples the source at (4i+1+ta + fy, 4j+1+tb + fx) where
    (fx, fy) is the flow at full-res pixel (4i+1+ta, 4j+1+tb) — passed here
    as the pre-sliced quadrant planes.  Integer iota -> f32 convert + f32
    add reproduces the driver's position arithmetic bit-exactly."""
    fx = fx_ref[0].astype(jnp.float32)
    fy = fy_ref[0].astype(jnp.float32)
    rows0 = pl.program_id(1) * ts
    gy = ((lax.broadcasted_iota(jnp.int32, fx.shape, 0) + rows0) * 4
          + (1 + ta)).astype(jnp.float32)
    gx = (lax.broadcasted_iota(jnp.int32, fx.shape, 1) * 4
          + (1 + tb)).astype(jnp.float32)
    sx = gx + fx
    sy = gy + fy
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w_max)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h_max)
    alpha = jnp.clip(sx - x0.astype(jnp.float32), 0.0, 1.0)
    beta = jnp.clip(sy - y0.astype(jnp.float32), 0.0, 1.0)
    return y0, x0, alpha, beta


def _ds4_sheared_accumulate(img_hbm, taps, slabs, accs, sem, *,
                            nt_w: int, h_max: int, w_max: int,
                            nbq: int, ts: int):
    """Sheared (dy-walk) accumulate over a PHASE-SPLIT source for the
    stride-4 tap grid of the fused warp+1/4-downscale.

    ``img_hbm`` is the u8-quad word source split by row phase:
    (4, hq, wp) per batch element, plane p holding source rows ≡ p (mod 4)
    — so for a fixed integer row delta ``dy`` (:= y0 − 4·R at final-grid
    row R) every output row reads phase plane ``dy & 3`` at plane row
    ``R + (dy >> 2)``: a CONTIGUOUS ts-row window, cut from the staged
    block with one dynamic sublane roll exactly like the stride-1 sheared
    core (`_slab_sheared_accumulate`).  The dy walk is restructured as a
    STATIC 4-way phase unroll with a per-phase dq (= dy>>2) fori_loop, so
    each phase's slab region is statically addressed.

    ``taps`` is the list of 4 corner sets (y0, x0, alpha, beta), one per
    tap quadrant (row offset 1+ta, col offset 1+tb); each accumulates into
    its own 3 accumulator planes (``accs[4*...]``) and the caller's
    epilogue replays the exact 0.5/0.5 tap averages.  Taps walk
    sequentially — each tap's dy span (~2-4 at smooth flows) and tile span
    is tighter than their union, and per-visit register pressure matches
    the proven stride-1 core.

    Accumulation-order exactness vs the composed tall-ds4 + downsample
    path: per (tap, pixel, source tile) at most two visit contributions
    exist (the y0 row and the y1 row), each formed as the same fused
    ``g0*wg0 + g1*wg1`` expression; f32 addition of two terms onto an
    exact-zero partial is commutative, so the phase-unrolled dy order
    (not always ascending) yields bit-identical sums, and partial sums
    join the accumulator in ascending tile order as before."""
    zeros = jnp.zeros(accs[0].shape, jnp.float32)
    for a in accs:
        a[...] = zeros

    base = pl.program_id(1) * ts
    n_qbands = img_hbm.shape[2] // TH
    cap = nbq * TH - ts
    stride_bands = nbq - ts // TH

    def unpack3(g):
        c0 = (g & 0xFF).astype(jnp.float32)
        c1 = ((g >> 8) & 0xFF).astype(jnp.float32)
        c2 = (g >> 16).astype(jnp.float32)
        return c0, c1, c2

    srow = lax.broadcasted_iota(jnp.int32, (ts, LANE), 0)

    # per-(tap, lane-tile) window stats in dy space (dy = y - 4*(base+s))
    wins = []
    d_lo_g = None
    d_hi_g = None
    for ti, (y0f, x0f, _af, _bf) in enumerate(taps):
        for lo in range(nt_w):
            sl = slice(lo * LANE, (lo + 1) * LANE)
            y0 = y0f[:, sl]
            x0 = x0f[:, sl]
            y1 = jnp.minimum(y0 + 1, h_max)
            x1 = jnp.minimum(x0 + 1, w_max)
            dys0 = y0 - 4 * (srow + base)
            dys1 = y1 - 4 * (srow + base)
            d_lo = jnp.min(dys0)
            d_hi = jnp.max(dys1)
            t_lo = jnp.min(x0) // LANE
            t_hi = jnp.max(x1) // LANE
            wins.append((d_lo, d_hi, t_lo, t_hi))
            d_lo_g = d_lo if d_lo_g is None else jnp.minimum(d_lo_g, d_lo)
            d_hi_g = d_hi if d_hi_g is None else jnp.maximum(d_hi_g, d_hi)

    # chunk walk in PHASE-PLANE rows: the (p, dq) window starts at plane
    # row base + dq; chunk k stages plane bands [cb, cb+nbq) of all 4
    # phases and serves window starts in its first (nbq - ts/TH) bands
    dq_lo_g = lax.shift_right_arithmetic(d_lo_g, 2)
    dq_hi_g = lax.shift_right_arithmetic(d_hi_g, 2)
    cb0 = (base + dq_lo_g) // TH
    span_bands = (base + dq_hi_g) // TH - cb0 + 1
    n_chunks = (span_bands + stride_bands - 1) // stride_bands

    def chunk_body(k, carry):
        cb = cb0 + k * stride_bands
        in_range = (cb >= 0) & (cb + nbq <= n_qbands)

        @pl.when(in_range)
        def _():
            for p in range(4):
                cp = pltpu.make_async_copy(
                    img_hbm.at[
                        pl.program_id(0), p,
                        pl.ds(pl.multiple_of(cb * TH, TH), nbq * TH),
                        :,
                    ],
                    slabs[p],
                    sem,
                )
                cp.start()
                cp.wait()

        @pl.when(jnp.logical_not(in_range))
        def _():
            # frame-edge chunk: stage in-bounds bands one by one; unstaged
            # slab rows keep stale finite words whose bilinear weights are
            # exactly zero (y0/y1 are clamped into [0, h-1])
            for q in range(nbq):
                sb = cb + q

                @pl.when((sb >= 0) & (sb < n_qbands))
                def _(sb=sb, q=q):
                    for p in range(4):
                        cp = pltpu.make_async_copy(
                            img_hbm.at[
                                pl.program_id(0), p,
                                pl.ds(pl.multiple_of(sb * TH, TH), TH),
                                :,
                            ],
                            slabs[p].at[pl.ds(q * TH, TH)],
                            sem,
                        )
                        cp.start()
                        cp.wait()

        c_lo_q = cb * TH - base  # lowest dq this chunk can serve
        for ti, (y0f, x0f, af, bf) in enumerate(taps):
            acc0, acc1, acc2 = accs[3 * ti : 3 * ti + 3]
            for lo in range(nt_w):
                d_lo_w, d_hi_w, t_lo, t_hi = wins[ti * nt_w + lo]
                # clamp the window's dq range to what this chunk serves
                dq_lo_c = jnp.maximum(
                    lax.shift_right_arithmetic(d_lo_w, 2), c_lo_q)
                dq_hi_c = jnp.minimum(
                    lax.shift_right_arithmetic(d_hi_w, 2),
                    c_lo_q + cap - 1)

                @pl.when(dq_lo_c <= dq_hi_c)
                def _(ti=ti, lo=lo, y0f=y0f, x0f=x0f, af=af, bf=bf,
                      d_lo_w=d_lo_w, d_hi_w=d_hi_w, dq_lo_c=dq_lo_c,
                      dq_hi_c=dq_hi_c, t_lo=t_lo, t_hi=t_hi,
                      acc0=acc0, acc1=acc1, acc2=acc2):
                    sl = slice(lo * LANE, (lo + 1) * LANE)
                    y0 = y0f[:, sl]
                    x0 = x0f[:, sl]
                    y1 = jnp.minimum(y0 + 1, h_max)
                    x1 = jnp.minimum(x0 + 1, w_max)
                    alpha = af[:, sl]
                    beta = bf[:, sl]
                    w00 = (1.0 - alpha) * (1.0 - beta)
                    w01 = alpha * (1.0 - beta)
                    w10 = (1.0 - alpha) * beta
                    w11 = alpha * beta
                    dys0 = y0 - 4 * (srow + base)
                    dys1 = y1 - 4 * (srow + base)
                    zero = jnp.zeros_like(w00)

                    def tile_body(t, accv):
                        a0v, a1v, a2v = accv
                        lx0 = x0 - t * LANE
                        lx1 = x1 - t * LANE
                        ok0 = (lx0 >= 0) & (lx0 < LANE)
                        ok1 = (lx1 >= 0) & (lx1 < LANE)
                        idx0 = jnp.clip(lx0, 0, LANE - 1)
                        idx1 = jnp.clip(lx1, 0, LANE - 1)
                        zp = jnp.zeros_like(zero)
                        part = (zp, zp, zp)
                        for p in range(4):
                            block = slabs[p][:, pl.ds(t * LANE, LANE)]
                            # dq values of this phase within the clamped
                            # dy range: dy = 4*dq + p in [d_lo_w, d_hi_w]
                            # intersected with the chunk's dq window
                            dq_lo_p = jnp.maximum(
                                lax.shift_right_arithmetic(
                                    d_lo_w - p + 3, 2), dq_lo_c)
                            dq_hi_p = jnp.minimum(
                                lax.shift_right_arithmetic(
                                    d_hi_w - p, 2), dq_hi_c)

                            def dq_body(dq, prt, p=p, block=block):
                                s0, s1, s2 = prt
                                off = base + dq - cb * TH
                                win = pltpu.roll(
                                    block, shift=-off, axis=0)[:ts, :]
                                g0 = jnp.take_along_axis(win, idx0, axis=1)
                                g1 = jnp.take_along_axis(win, idx1, axis=1)
                                dy = 4 * dq + p
                                m0 = dys0 == dy
                                m1 = dys1 == dy
                                wg0 = (
                                    jnp.where(m0 & ok0, w00, zero)
                                    + jnp.where(m1 & ok0, w10, zero)
                                )
                                wg1 = (
                                    jnp.where(m0 & ok1, w01, zero)
                                    + jnp.where(m1 & ok1, w11, zero)
                                )
                                r0, g0c, b0c = unpack3(g0)
                                r1, g1c, b1c = unpack3(g1)
                                return (s0 + (r0 * wg0 + r1 * wg1),
                                        s1 + (g0c * wg0 + g1c * wg1),
                                        s2 + (b0c * wg0 + b1c * wg1))

                            part = lax.fori_loop(
                                dq_lo_p, dq_hi_p + 1, dq_body, part)
                        p0, p1, p2 = part
                        return (a0v + p0, a1v + p1, a2v + p2)

                    a0v, a1v, a2v = lax.fori_loop(
                        t_lo, t_hi + 1, tile_body,
                        (acc0[:, sl], acc1[:, sl], acc2[:, sl]),
                    )
                    acc0[:, sl] = a0v
                    acc1[:, sl] = a1v
                    acc2[:, sl] = a2v

        return carry

    lax.fori_loop(0, n_chunks, chunk_body, 0)


def _warp_kernel_u8_sheared_ds4_pair(
        img_a_hbm, img_b_hbm,
        fxa00, fya00, fxa01, fya01, fxa10, fya10, fxa11, fya11,
        fxb00, fyb00, fxb01, fyb01, fxb10, fyb10, fxb11, fyb11,
        oa0, oa1, oa2, ob0, ob1, ob2,
        slab0, slab1, slab2, slab3,
        a00_0, a00_1, a00_2, a01_0, a01_1, a01_2,
        a10_0, a10_1, a10_2, a11_0, a11_1, a11_2,
        sem, *,
        nt_w: int, h_max: int, w_max: int, nbq: int, ts: int):
    """Fused WarpDs4Pair on the sheared phase-split core, emitting the
    FINAL 1/4-resolution planes: both tap-grid warps of a v4 block entry
    (jax_ops._op_warp_ds4_pair) run as 4 tap-quadrant accumulations each,
    and the epilogue replays ``_downsample_axis``'s exact 0.5/0.5 tap
    averages (storage-dtype cast first, h-axis pair then w-axis pair) —
    so the (h/2, w/2) warped tensor and its two downsample passes never
    exist.  Bit-identical to warp_pallas_pair(abs_pos=True) +
    _downsample_axis x2 (tools/warp_ds4_ab.py)."""
    slabs = (slab0, slab1, slab2, slab3)
    accs = (a00_0, a00_1, a00_2, a01_0, a01_1, a01_2,
            a10_0, a10_1, a10_2, a11_0, a11_1, a11_2)
    scale = jnp.float32(1.0 / 255.0)

    def run_side(flow_refs, outs, img_hbm):
        taps = []
        for ta in range(2):
            for tb in range(2):
                fx_ref, fy_ref = flow_refs[2 * (2 * ta + tb):][:2]
                taps.append(_ds4_tap_corners(
                    fx_ref, fy_ref, ta=ta, tb=tb,
                    h_max=h_max, w_max=w_max, ts=ts))
        _ds4_sheared_accumulate(
            img_hbm, taps, slabs, accs, sem,
            nt_w=nt_w, h_max=h_max, w_max=w_max, nbq=nbq, ts=ts)
        o0, o1, o2 = outs
        dt = o0.dtype
        half = jnp.asarray(0.5, dt)
        for ch, o in enumerate((o0, o1, o2)):
            v00 = (accs[0 + ch][...] * scale).astype(dt)   # tap (0,0)
            v01 = (accs[3 + ch][...] * scale).astype(dt)   # tap (0,1)
            v10 = (accs[6 + ch][...] * scale).astype(dt)   # tap (1,0)
            v11 = (accs[9 + ch][...] * scale).astype(dt)   # tap (1,1)
            u0 = v00 * half + v10 * half   # h-axis pair (rows 2i, 2i+1)
            u1 = v01 * half + v11 * half
            o[0] = u0 * half + u1 * half   # w-axis pair

    run_side((fxa00, fya00, fxa01, fya01, fxa10, fya10, fxa11, fya11),
             (oa0, oa1, oa2), img_a_hbm)
    run_side((fxb00, fyb00, fxb01, fyb01, fxb10, fyb10, fxb11, fyb11),
             (ob0, ob1, ob2), img_b_hbm)


def _warp_kernel_u8_slab_tall_flow_pair(
        img_a_hbm, img_b_hbm, sxa_ref, sya_ref, sxb_ref, syb_ref,
        oa0, oa1, oa2, ob0, ob1, ob2,
        slab, acc0, acc1, acc2, sem, *,
        nt_w: int, h_max: int, w_max: int, ns: int = 1,
        raw_flow: bool = False):
    """PAIR form of the inflow TALL slab kernel: TWO independent warps on
    the same output grid (different sources, different flows) in one
    pallas_call.  The v4 graph warps its frame pair at every refinement
    scale (warp_2+warp_3, warp_4+warp_5, the render pair —
    /root/reference/models/rife-v4.6/flownet.param); as separate calls each
    pays the full Mosaic per-cell fixed cost (~6 us x B*H/8 cells — the
    measured ~20 ms empty-range floor per warp at B=24 1080p).  One call
    with two sequential accumulate passes pays it once, reusing the same
    slab and accumulator scratch; the band DMAs and gather work are
    unchanged (different sources cannot share them)."""
    scale = jnp.float32(1.0 / 255.0)
    ya, xa, aa, ba = _inkernel_corners(sxa_ref, sya_ref, h_max=h_max,
                                       w_max=w_max, raw_flow=raw_flow)
    _slab_tall_accumulate(img_a_hbm, ya, xa, aa, ba,
                          slab, acc0, acc1, acc2, sem,
                          nt_w=nt_w, h_max=h_max, w_max=w_max, ns=ns)
    oa0[0] = (acc0[...] * scale).astype(oa0.dtype)
    oa1[0] = (acc1[...] * scale).astype(oa1.dtype)
    oa2[0] = (acc2[...] * scale).astype(oa2.dtype)
    yb, xb, ab, bb = _inkernel_corners(sxb_ref, syb_ref, h_max=h_max,
                                       w_max=w_max, raw_flow=raw_flow)
    _slab_tall_accumulate(img_b_hbm, yb, xb, ab, bb,
                          slab, acc0, acc1, acc2, sem,
                          nt_w=nt_w, h_max=h_max, w_max=w_max, ns=ns)
    ob0[0] = (acc0[...] * scale).astype(ob0.dtype)
    ob1[0] = (acc1[...] * scale).astype(ob1.dtype)
    ob2[0] = (acc2[...] * scale).astype(ob2.dtype)


def _warp_kernel_u8_slab_tall_flow_render(
        img_m_hbm, img_i_hbm, sxm_ref, sym_ref, sxi_ref, syi_ref, mask_ref,
        o0, o1, o2,
        slab, acc0, acc1, acc2, st0, st1, st2, sem, *,
        nt_w: int, h_max: int, w_max: int, ns: int = 1,
        raw_flow: bool = False):
    """RENDER form of the pair kernel: warp both frames and blend by the
    fusion mask in-kernel — ``out = warp_m*mask + warp_i*(1-mask)`` — so
    only the three blended planes are ever written to HBM (the unfused
    blend reads back 6 planes and writes 3 more).  The two warp results
    round-trip through the output dtype (``st0..2`` stash scratch) before
    the blend, exactly like the composed ops, so results stay
    bit-identical to two ``warp_pallas`` calls + an XLA blend.
    Blend algebra: /root/reference/models/rife-v4.6/flownet.param:208-217
    tail; graph/rewrite.py fuse_render_blend."""
    scale = jnp.float32(1.0 / 255.0)
    ym, xm, am, bm = _inkernel_corners(sxm_ref, sym_ref, h_max=h_max,
                                       w_max=w_max, raw_flow=raw_flow)
    _slab_tall_accumulate(img_m_hbm, ym, xm, am, bm,
                          slab, acc0, acc1, acc2, sem,
                          nt_w=nt_w, h_max=h_max, w_max=w_max, ns=ns)
    st0[...] = (acc0[...] * scale).astype(st0.dtype)
    st1[...] = (acc1[...] * scale).astype(st1.dtype)
    st2[...] = (acc2[...] * scale).astype(st2.dtype)
    yi, xi, ai, bi = _inkernel_corners(sxi_ref, syi_ref, h_max=h_max,
                                       w_max=w_max, raw_flow=raw_flow)
    _slab_tall_accumulate(img_i_hbm, yi, xi, ai, bi,
                          slab, acc0, acc1, acc2, sem,
                          nt_w=nt_w, h_max=h_max, w_max=w_max, ns=ns)
    m = mask_ref[0]
    one = jnp.asarray(1.0, m.dtype)
    o0[0] = st0[...] * m + (acc0[...] * scale).astype(o0.dtype) * (one - m)
    o1[0] = st1[...] * m + (acc1[...] * scale).astype(o1.dtype) * (one - m)
    o2[0] = st2[...] * m + (acc2[...] * scale).astype(o2.dtype) * (one - m)


def _warp_kernel_u8_slab_tall(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                              o0_ref, o1_ref, o2_ref,
                              slab, acc0, acc1, acc2, sem, *,
                              nt_w: int, h_max: int, w_max: int):
    """TALL form of the slab kernel: one (64, 128) gather pair per (band,
    window, tile) — the band's 8 source rows each repeated over the 8
    output sublanes — replaces the row loop's eight (8, 128) pairs.  Same
    VPU work, ~8x fewer instructions (the mc-kernel tall experiment showed
    Mosaic's per-instruction overhead is worth ~12%; here the row loop is
    the whole inner body).  Row contributions fold back with one
    (8,8,128)-block sum per channel."""
    _slab_tall_body(
        img_hbm, y0_ref[0], x0_ref[0], a_ref[0], b_ref[0],
        o0_ref, o1_ref, o2_ref, slab, acc0, acc1, acc2, sem,
        nt_w=nt_w, h_max=h_max, w_max=w_max,
    )


def _warp_kernel_u8_slab_tall_flow(img_hbm, sx_ref, sy_ref,
                                   o0_ref, o1_ref, o2_ref,
                                   slab, acc0, acc1, acc2, sem, *,
                                   nt_w: int, h_max: int, w_max: int,
                                   ns: int = 1, raw_flow: bool = False):
    """Inflow TALL slab kernel: the sample indices/weights are computed
    IN-KERNEL from the absolute sample positions instead of being
    materialized by the XLA driver.

    Why: the driver form writes four full-resolution operands per warp
    (y0/x0 i32 + alpha/beta f32 — ~800 MB at B=24 1080p) plus their edge
    pads and clip/floor fusion chains; the per-op trace attributed ~45 ms
    of the 499 ms v4.6 step to these chains and copies on top of the
    kernels' own 250 ms.  Here the kernel receives just sx/sy (f32, one
    fused iota+add over the flow in the driver) and derives the indices
    with the identical f32 op sequence per stripe (same floor/clip/astype
    — results are bit-identical; VPU cost is a few elementwise ops over
    an (8, W) tile, noise next to the operand DMA it replaces).
    ``w_max``/``h_max`` bound the clips exactly as the driver did."""
    y0, x0, alpha, beta = _inkernel_corners(
        sx_ref, sy_ref, h_max=h_max, w_max=w_max, raw_flow=raw_flow)
    _slab_tall_body(
        img_hbm, y0, x0, alpha, beta,
        o0_ref, o1_ref, o2_ref, slab, acc0, acc1, acc2, sem,
        nt_w=nt_w, h_max=h_max, w_max=w_max, ns=ns,
    )


def _warp_kernel_u8_slab(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                         o0_ref, o1_ref, o2_ref,
                         slab, acc0, acc1, acc2, sem, *,
                         nt_w: int, h_max: int, w_max: int):
    """Slab-streaming u8-quad warp for frames beyond the VMEM ceiling
    (UHD/4K — the reference's UHD mode still runs context/fusion warps at
    full resolution, /root/reference/src/rife.cpp:294-332).

    The image stays in HBM; the band loop is outermost and DMAs one 8-row
    full-width slab per source band, which every 128-lane output window then
    gathers from.  VMEM holds only the slab + full-width accumulators, so
    any resolution fits.  Per-window band/tile ranges still skip work."""
    zeros_row = jnp.zeros(acc0.shape, jnp.float32)
    acc0[...] = zeros_row
    acc1[...] = zeros_row
    acc2[...] = zeros_row

    # per-window (128-lane) iteration ranges, precomputed once
    ranges = []
    for lo in range(nt_w):
        sl = pl.ds(lo * LANE, LANE)
        y0 = y0_ref[0, :, sl]
        x0 = x0_ref[0, :, sl]
        ranges.append((
            jnp.min(y0) // TH,
            jnp.max(jnp.minimum(y0 + 1, h_max)) // TH,
            jnp.min(x0) // LANE,
            jnp.max(jnp.minimum(x0 + 1, w_max)) // LANE,
        ))

    band_lo = jnp.min(y0_ref[0]) // TH
    band_hi = jnp.max(jnp.minimum(y0_ref[0] + 1, h_max)) // TH

    def unpack3(g):
        c0 = (g & 0xFF).astype(jnp.float32)
        c1 = ((g >> 8) & 0xFF).astype(jnp.float32)
        # byte 3 is zero by construction (u8 packing is gated to <=3
        # channels), so the top shift needs no mask
        c2 = (g >> 16).astype(jnp.float32)
        return c0, c1, c2

    def band_body(band, carry):
        cp = pltpu.make_async_copy(
            img_hbm.at[
                pl.program_id(0),
                pl.ds(pl.multiple_of(band * TH, TH), TH),
                :,
            ],
            slab,
            sem,
        )
        cp.start()
        cp.wait()

        for lo in range(nt_w):
            blo, bhi, t_lo, t_hi = ranges[lo]

            @pl.when((band >= blo) & (band <= bhi))
            def _(lo=lo, t_lo=t_lo, t_hi=t_hi):
                sl = pl.ds(lo * LANE, LANE)
                y0 = y0_ref[0, :, sl]
                x0 = x0_ref[0, :, sl]
                y1 = jnp.minimum(y0 + 1, h_max)
                x1 = jnp.minimum(x0 + 1, w_max)
                alpha = a_ref[0, :, sl]
                beta = b_ref[0, :, sl]
                w00 = (1.0 - alpha) * (1.0 - beta)
                w01 = alpha * (1.0 - beta)
                w10 = (1.0 - alpha) * beta
                w11 = alpha * beta
                zero = jnp.zeros_like(w00)

                def tile_body(t, accs):
                    a0v, a1v, a2v = accs
                    chunk = slab[:, pl.ds(t * LANE, LANE)]
                    lx0 = x0 - t * LANE
                    lx1 = x1 - t * LANE
                    ok0 = (lx0 >= 0) & (lx0 < LANE)
                    ok1 = (lx1 >= 0) & (lx1 < LANE)
                    lx0c = jnp.clip(lx0, 0, LANE - 1)
                    lx1c = jnp.clip(lx1, 0, LANE - 1)
                    for k in range(TH):
                        r = band * TH + k
                        m_y0 = (y0 == r)
                        m_y1 = (y1 == r)
                        tile = jnp.broadcast_to(chunk[k : k + 1, :], (TH, LANE))
                        g0 = jnp.take_along_axis(tile, lx0c, axis=1)
                        g1 = jnp.take_along_axis(tile, lx1c, axis=1)
                        wg0 = (
                            jnp.where(m_y0 & ok0, w00, zero)
                            + jnp.where(m_y1 & ok0, w10, zero)
                        )
                        wg1 = (
                            jnp.where(m_y0 & ok1, w01, zero)
                            + jnp.where(m_y1 & ok1, w11, zero)
                        )
                        r0, g0c, b0 = unpack3(g0)
                        r1, g1c, b1 = unpack3(g1)
                        a0v = a0v + r0 * wg0 + r1 * wg1
                        a1v = a1v + g0c * wg0 + g1c * wg1
                        a2v = a2v + b0 * wg0 + b1 * wg1
                    return (a0v, a1v, a2v)

                a0v, a1v, a2v = lax.fori_loop(
                    t_lo, t_hi + 1, tile_body,
                    (acc0[:, sl], acc1[:, sl], acc2[:, sl]),
                )
                acc0[:, sl] = a0v
                acc1[:, sl] = a1v
                acc2[:, sl] = a2v

        return carry

    lax.fori_loop(band_lo, band_hi + 1, band_body, 0)
    scale = jnp.float32(1.0 / 255.0)
    o0_ref[0] = (acc0[...] * scale).astype(o0_ref.dtype)
    o1_ref[0] = (acc1[...] * scale).astype(o1_ref.dtype)
    o2_ref[0] = (acc2[...] * scale).astype(o2_ref.dtype)


def _warp_kernel_u8_slab_ds2(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                             o0_ref, o1_ref, o2_ref,
                             slab, acc, sem, *,
                             nt_w: int, h_max: int, w_max: int):
    """Fused ``Interp(1/2, bilinear) ∘ rife.Warp`` slab kernel (u8-quad).

    The half-pixel bilinear 1/2 downsample reads EVERY warped pixel
    (out[m,n] = the 0.5/0.5 average chain over the 2x2 block
    {2m,2m+1}x{2n,2n+1}), so unlike WarpDs4 no gather is skipped — the win
    is structural: the full-res warped tensor never exists.  Output pixel
    (m,n) decomposes into four PHASES p=(pi,pj); phase p's contribution is
    a plain warp evaluated at the full-res sample positions of pixel
    (2m+pi, 2n+pj), which lives at HALF-RES output coordinates — so each
    phase is an independent abs-pos warp onto the same (TH, LANE) output
    stripe and no strided/deinterleaving writes are needed.  Per
    (band, window) the kernel runs the tall slab gather once per phase into
    per-phase accumulators; the epilogue then replays the EXACT unfused
    arithmetic — per-phase ``(acc/255).astype(dtype)`` rounding, then the
    h-axis 0.5/0.5 lerp, then the w-axis one, all in the storage dtype —
    so the result is bit-identical to warp-then-``resize2d`` while writing
    1/4 the output bytes and skipping the separate resize pass
    (/root/reference/models/rife-v4.6/flownet.param warp_2/warp_3 ->
    cat_7 -> upsample_15 is the motivating pair; the reference warps at
    full res because its GPU gather is free, src/rife.cpp:381-1212)."""
    acc[...] = jnp.zeros(acc.shape, jnp.float32)

    # per-window iteration ranges: union over the 4 phases (their positions
    # differ by at most one source pixel, so the union is tight)
    ranges = []
    for lo in range(nt_w):
        sl = pl.ds(lo * LANE, LANE)
        y0 = y0_ref[0, :, :, sl]  # (4, TH, LANE)
        x0 = x0_ref[0, :, :, sl]
        ranges.append((
            jnp.min(y0) // TH,
            jnp.max(jnp.minimum(y0 + 1, h_max)) // TH,
            jnp.min(x0) // LANE,
            jnp.max(jnp.minimum(x0 + 1, w_max)) // LANE,
        ))

    band_lo = jnp.min(y0_ref[0]) // TH
    band_hi = jnp.max(jnp.minimum(y0_ref[0] + 1, h_max)) // TH

    def unpack3(g):
        c0 = (g & 0xFF).astype(jnp.float32)
        c1 = ((g >> 8) & 0xFF).astype(jnp.float32)
        # byte 3 is zero by construction (u8 packing is gated to <=3
        # channels), so the top shift needs no mask
        c2 = (g >> 16).astype(jnp.float32)
        return c0, c1, c2

    def tall(v):  # (TH, LANE) -> (TH*TH, LANE): same window data per block
        return jnp.broadcast_to(v[None], (TH, TH, LANE)).reshape(
            TH * TH, LANE)

    # block k of the tall layout handles source row band*TH + k
    k_of = lax.broadcasted_iota(jnp.int32, (TH * TH, LANE), 0) // TH

    def band_body(band, carry):
        cp = pltpu.make_async_copy(
            img_hbm.at[
                pl.program_id(0),
                pl.ds(pl.multiple_of(band * TH, TH), TH),
                :,
            ],
            slab,
            sem,
        )
        cp.start()
        cp.wait()
        r_tall = band * TH + k_of

        for lo in range(nt_w):
            blo, bhi, t_lo, t_hi = ranges[lo]

            @pl.when((band >= blo) & (band <= bhi))
            def _(lo=lo, t_lo=t_lo, t_hi=t_hi):
                sl = pl.ds(lo * LANE, LANE)
                # one tall-gather pass per phase: phases share the slab DMA
                # and the window's range scan, and only one phase's
                # mask/weight arrays are live at a time (vreg pressure)
                for p in range(4):
                    y0 = y0_ref[0, p, :, sl]
                    x0 = x0_ref[0, p, :, sl]
                    y1 = jnp.minimum(y0 + 1, h_max)
                    x1 = jnp.minimum(x0 + 1, w_max)
                    alpha = a_ref[0, p, :, sl]
                    beta = b_ref[0, p, :, sl]
                    w00t = tall((1.0 - alpha) * (1.0 - beta))
                    w01t = tall(alpha * (1.0 - beta))
                    w10t = tall((1.0 - alpha) * beta)
                    w11t = tall(alpha * beta)
                    m0 = (tall(y0) == r_tall)
                    m1 = (tall(y1) == r_tall)
                    zero = jnp.zeros_like(w00t)

                    def tile_body(t, accs, x0=x0, x1=x1, m0=m0, m1=m1,
                                  w00t=w00t, w01t=w01t, w10t=w10t,
                                  w11t=w11t, zero=zero):
                        a0v, a1v, a2v = accs
                        chunk = slab[:, pl.ds(t * LANE, LANE)]
                        tile64 = jnp.broadcast_to(
                            chunk[:, None, :], (TH, TH, LANE)
                        ).reshape(TH * TH, LANE)
                        lx0 = x0 - t * LANE
                        lx1 = x1 - t * LANE
                        ok0 = tall((lx0 >= 0) & (lx0 < LANE))
                        ok1 = tall((lx1 >= 0) & (lx1 < LANE))
                        idx0 = tall(jnp.clip(lx0, 0, LANE - 1))
                        idx1 = tall(jnp.clip(lx1, 0, LANE - 1))
                        g0 = jnp.take_along_axis(tile64, idx0, axis=1)
                        g1 = jnp.take_along_axis(tile64, idx1, axis=1)
                        wg0 = (
                            jnp.where(m0 & ok0, w00t, zero)
                            + jnp.where(m1 & ok0, w10t, zero)
                        )
                        wg1 = (
                            jnp.where(m0 & ok1, w01t, zero)
                            + jnp.where(m1 & ok1, w11t, zero)
                        )
                        r0, g0c, b0c = unpack3(g0)
                        r1, g1c, b1c = unpack3(g1)
                        c0 = (r0 * wg0 + r1 * wg1).reshape(TH, TH, LANE)
                        c1 = (g0c * wg0 + g1c * wg1).reshape(TH, TH, LANE)
                        c2 = (b0c * wg0 + b1c * wg1).reshape(TH, TH, LANE)
                        return (a0v + c0.sum(0), a1v + c1.sum(0),
                                a2v + c2.sum(0))

                    a0v, a1v, a2v = lax.fori_loop(
                        t_lo, t_hi + 1, tile_body,
                        (acc[p, 0, :, sl], acc[p, 1, :, sl],
                         acc[p, 2, :, sl]),
                    )
                    acc[p, 0, :, sl] = a0v
                    acc[p, 1, :, sl] = a1v
                    acc[p, 2, :, sl] = a2v

        return carry

    lax.fori_loop(band_lo, band_hi + 1, band_body, 0)

    # exact unfused epilogue: round each phase to the storage dtype first
    # (the standalone warp writes (acc/255).astype(dtype)), then the
    # h-then-w 0.5/0.5 lerps in that dtype (resize2d's _downsample_axis)
    scale = jnp.float32(1.0 / 255.0)
    half = jnp.asarray(0.5, o0_ref.dtype)
    for ci, o_ref in enumerate((o0_ref, o1_ref, o2_ref)):
        v = [(acc[p, ci] * scale).astype(o_ref.dtype) for p in range(4)]
        u0 = v[0] * half + v[2] * half   # row-phase average, col phase 0
        u1 = v[1] * half + v[3] * half   # row-phase average, col phase 1
        o_ref[0] = u0 * half + u1 * half


def _warp_pallas_u8_ds2_impl(image, flow, *, planar: bool = False):
    """Host driver for the fused warp+1/2-downsample u8 kernel.

    ``image``: (B,H,W,C<=3) NHWC or (B,H,C,W) planar, u8-origin values;
    ``flow``: full-resolution flow on the SOURCE grid.  Output is the
    half-resolution warped-then-downscaled frame, bit-identical to
    ``warp_pallas(...)`` followed by ``resize2d(y, H/2, W/2)``."""
    if planar:
        b, h, c, w = image.shape  # BHCW
    else:
        b, h, w, c = image.shape
    out_dtype = image.dtype
    assert h % 2 == 0 and w % 2 == 0, "caller guards odd sizes"
    ho, wo = h // 2, w // 2
    hp, wp = _round_up(h, TH), _round_up(w, LANE)        # source staging
    hp_o, wp_o = _round_up(ho, TH), _round_up(wo, LANE)  # output grid
    nt_w = wp_o // LANE

    # u8-quad word packing, identical to _warp_pallas_u8_impl_any
    def _chan_u8(i):
        plane = image[:, :, i, :] if planar else image[..., i]
        return jnp.round(
            jnp.clip(plane.astype(jnp.float32), 0.0, 1.0) * 255.0
        ).astype(jnp.int32)

    words = _chan_u8(0)
    for ci in range(1, c):
        words = words | (_chan_u8(ci) << (8 * ci))  # (B,H,W)
    words = jnp.pad(
        words, ((0, 0), (0, hp - h), (0, wp - w)), constant_values=0
    )

    # full-res sample positions, then phase-deinterleaved to the output
    # grid: phase p = 2*pi + pj holds the positions of full-res pixels
    # (2m+pi, 2n+pj) at half-res coordinates (m, n)
    fx, fy = _flow_xy(flow, planar)
    gy = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = gx[None] + fx
    sy = gy[None] + fy

    def phases(v):  # (B,H,W) -> (B,4,Ho,Wo)
        return jnp.stack(
            [v[:, pi::2, pj::2] for pi in (0, 1) for pj in (0, 1)], axis=1
        )

    sx4, sy4 = phases(sx), phases(sy)
    x0 = jnp.clip(jnp.floor(sx4).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy4).astype(jnp.int32), 0, h - 1)
    alpha = jnp.clip(sx4 - x0.astype(jnp.float32), 0.0, 1.0)
    beta = jnp.clip(sy4 - y0.astype(jnp.float32), 0.0, 1.0)

    # EDGE-pad (see the sibling drivers: zero padding poisons the padded
    # columns' dynamic ranges; padded outputs are cropped)
    def pad_edge4(x):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, hp_o - ho), (0, wp_o - wo)), mode="edge"
        )

    operands = [pad_edge4(v) for v in (y0, x0, alpha, beta)]

    grid = (b, hp_o // TH)
    img_spec = pl.BlockSpec(memory_space=pl.ANY)
    idx_spec = pl.BlockSpec(
        (1, 4, TH, wp_o), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, TH, wp_o), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        functools.partial(
            _warp_kernel_u8_slab_ds2, nt_w=nt_w, h_max=h - 1, w_max=w - 1
        ),
        grid=grid,
        in_specs=[img_spec] + [idx_spec] * 4,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, hp_o, wp_o), out_dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((TH, wp), jnp.int32),          # source slab
            pltpu.VMEM((4, 3, TH, wp_o), jnp.float32),  # per-phase accs
            pltpu.SemaphoreType.DMA,
        ],
    )(words, *operands)

    if planar:
        return jnp.stack(outs, axis=2)[:, :ho, :c, :wo]
    return jnp.stack(outs, axis=-1)[:, :ho, :wo, :c]


@functools.partial(jax.jit, static_argnames=("planar",))
def warp_ds2_pallas(image, flow, planar: bool = False):
    """Fused backward warp + exact half-pixel bilinear 1/2 downsample for
    u8-origin images (B,H,W,C<=3) x (B,H,W,2) -> (B,H/2,W/2,C); bit-exact
    vs ``warp_pallas`` + ``resize2d`` (see _warp_kernel_u8_slab_ds2)."""
    return _warp_pallas_u8_ds2_impl(image, flow, planar=planar)


def _warp_kernel_u8_sdelta(img_hbm, y0_ref, x0_ref, a_ref, b_ref,
                           dlo_ref, dhi_ref, tlo_ref, thi_ref,
                           o0_ref, o1_ref, o2_ref,
                           slab, acc0, acc1, acc2, sem, *,
                           nt_w: int, h_max: int, w_max: int, hp: int):
    """Slab-DELTA u8-quad warp: slab streaming + delta-roll gathering.

    The slab kernel's inner loop one-hot-matches each of a band's 8 rows
    (16 lane-gathers per in-range band-window); the delta kernel gathers
    once per integer row-delta (2 per (d, tile)) but stages the WHOLE image
    in VMEM.  This kernel takes both wins: it streams a 2-band (16-row)
    window of the source through VMEM (no resident-image ceiling) and
    serves each row-delta with one sublane roll + one gather pair, so the
    typical gather count per stripe is (y-spread+2) x (x-tile-span) x 2
    instead of bands x 8 x tiles x 2 — ~5x fewer at the smooth flows real
    RIFE weights produce (lane gathers are the measured bottleneck:
    tools/prim_sweep.py, ~122 vs ~48 cycles for sublane ops).

    Staged-band coordinates: staged band p holds source rows
    [8(p-1), 8p) — one band of top slack so negative window starts at the
    frame top stay addressable (their taps have zero weight, exactly as in
    the delta kernel).  The VMEM slab holds the staged pair (p, p+1); a
    row-delta d belongs to pair p iff its 8-row window starts inside staged
    band p, so the window always lies within the pair and one sublane roll
    aligns it.

    Per-window iteration ranges arrive as SMEM scalars, reduced by XLA in
    one fused pass over the operand arrays: computing them in-kernel costs
    ~60 cross-lane reductions per stripe, which measured as ~90% of the
    whole kernel at zero flow (the per-stripe floor)."""
    base_y = pl.program_id(1) * TH
    n_src_bands = hp // TH

    zeros_row = jnp.zeros(acc0.shape, jnp.float32)
    acc0[...] = zeros_row
    acc1[...] = zeros_row
    acc2[...] = zeros_row

    srow = lax.broadcasted_iota(jnp.int32, (TH, LANE), 0) + base_y

    def unpack3(g):
        c0 = (g & 0xFF).astype(jnp.float32)
        c1 = ((g >> 8) & 0xFF).astype(jnp.float32)
        # byte 3 is zero by construction (u8 packing is gated to <=3
        # channels), so the top shift needs no mask
        c2 = (g >> 16).astype(jnp.float32)
        return c0, c1, c2

    # per-window source ranges: XLA-precomputed, scalar reads from SMEM
    wins = []
    d_lo_g = None
    d_hi_g = None
    j = pl.program_id(1)
    for lo in range(nt_w):
        d_lo = dlo_ref[0, lo, j]
        d_hi = dhi_ref[0, lo, j]
        t_lo = tlo_ref[0, lo, j]
        t_hi = thi_ref[0, lo, j]
        wins.append((d_lo, d_hi, t_lo, t_hi))
        d_lo_g = d_lo if d_lo_g is None else jnp.minimum(d_lo_g, d_lo)
        d_hi_g = d_hi if d_hi_g is None else jnp.maximum(d_hi_g, d_hi)

    # staged-band pair range: pair p serves window starts in staged band p
    p_lo = (base_y + d_lo_g + TH) // TH
    p_hi = (base_y + d_hi_g + TH) // TH

    def dma_staged_band(p, slot):
        src_band = p - 1  # staged band p = source rows [8(p-1), 8p)
        @pl.when((src_band >= 0) & (src_band < n_src_bands))
        def _():
            cp = pltpu.make_async_copy(
                img_hbm.at[
                    pl.program_id(0),
                    pl.ds(pl.multiple_of(src_band * TH, TH), TH),
                    :,
                ],
                slab.at[pl.ds(pl.multiple_of(slot * TH, TH), TH)],
                sem,
            )
            cp.start()
            cp.wait()

    dma_staged_band(p_lo, 0)
    dma_staged_band(p_lo + 1, 1)

    def pair_body(p, carry):
        # windows whose start row lies in staged band p: d in
        # [8p - 8 - base_y, 8p - 1 - base_y]
        dp_lo = p * TH - TH - base_y
        dp_hi = dp_lo + TH - 1

        for lo in range(nt_w):
            d_lo_w, d_hi_w, t_lo, t_hi = wins[lo]
            dd_lo = jnp.maximum(d_lo_w, dp_lo)
            dd_hi = jnp.minimum(d_hi_w, dp_hi)

            @pl.when(dd_lo <= dd_hi)
            def _(lo=lo, dd_lo=dd_lo, dd_hi=dd_hi, t_lo=t_lo, t_hi=t_hi):
                sl = pl.ds(lo * LANE, LANE)
                y0 = y0_ref[0, :, sl]
                x0 = x0_ref[0, :, sl]
                y1 = jnp.minimum(y0 + 1, h_max)
                x1 = jnp.minimum(x0 + 1, w_max)
                alpha = a_ref[0, :, sl]
                beta = b_ref[0, :, sl]
                w00 = (1.0 - alpha) * (1.0 - beta)
                w01 = alpha * (1.0 - beta)
                w10 = (1.0 - alpha) * beta
                w11 = alpha * beta
                zero = jnp.zeros_like(w00)
                d0 = y0 - srow
                d1 = y1 - srow

                def delta_body(d, accs):
                    off = base_y + d + TH - p * TH  # in [0, TH)
                    m0 = (d0 == d)
                    m1 = (d1 == d)

                    def tile_body(t, accs):
                        a0v, a1v, a2v = accs
                        pair = slab[:, pl.ds(t * LANE, LANE)]
                        win = pltpu.roll(pair, shift=-off, axis=0)[:TH, :]
                        lx0 = x0 - t * LANE
                        lx1 = x1 - t * LANE
                        ok0 = (lx0 >= 0) & (lx0 < LANE)
                        ok1 = (lx1 >= 0) & (lx1 < LANE)
                        lx0c = jnp.clip(lx0, 0, LANE - 1)
                        lx1c = jnp.clip(lx1, 0, LANE - 1)
                        g0 = jnp.take_along_axis(win, lx0c, axis=1)
                        g1 = jnp.take_along_axis(win, lx1c, axis=1)
                        wg0 = (
                            jnp.where(m0 & ok0, w00, zero)
                            + jnp.where(m1 & ok0, w10, zero)
                        )
                        wg1 = (
                            jnp.where(m0 & ok1, w01, zero)
                            + jnp.where(m1 & ok1, w11, zero)
                        )
                        r0, g0c, b0c = unpack3(g0)
                        r1, g1c, b1c = unpack3(g1)
                        a0v = a0v + r0 * wg0 + r1 * wg1
                        a1v = a1v + g0c * wg0 + g1c * wg1
                        a2v = a2v + b0c * wg0 + b1c * wg1
                        return (a0v, a1v, a2v)

                    return lax.fori_loop(t_lo, t_hi + 1, tile_body, accs)

                a0v, a1v, a2v = lax.fori_loop(
                    dd_lo, dd_hi + 1, delta_body,
                    (acc0[:, sl], acc1[:, sl], acc2[:, sl]),
                )
                acc0[:, sl] = a0v
                acc1[:, sl] = a1v
                acc2[:, sl] = a2v

        # advance the pair window: (p, p+1) -> (p+1, p+2)
        @pl.when(p < p_hi)
        def _():
            slab[pl.ds(0, TH)] = slab[pl.ds(TH, TH)]
            dma_staged_band(p + 2, 1)

        return carry

    lax.fori_loop(p_lo, p_hi + 1, pair_body, 0)

    scale = jnp.float32(1.0 / 255.0)
    o0_ref[0] = (acc0[...] * scale).astype(o0_ref.dtype)
    o1_ref[0] = (acc1[...] * scale).astype(o1_ref.dtype)
    o2_ref[0] = (acc2[...] * scale).astype(o2_ref.dtype)


def _warp_pallas_u8_impl_any(image, flow, *, slab_mode: bool,
                             delta_mode: bool = False,
                             sdelta_mode: bool = False,
                             abs_pos: bool = False,
                             planar: bool = False,
                             planar_out: bool | None = None):
    """Shared host-side driver for the u8-quad variants.

    ``abs_pos=True``: ``flow`` carries ABSOLUTE sample positions (sx, sy)
    on an arbitrary output grid of shape flow.shape[1:3] (may differ from
    the source grid) — used by the fused downscaled-warp rewrite
    (graph/rewrite.py) to evaluate only the Interp tap pixels.  Requires a
    streaming variant (slab/sdelta); band/delta assume out grid == source
    grid for their whole-image staging.

    ``planar=True``: image is (B,C,H,W) planes and flow (B,2,Ho,Wo); the
    result comes back as planes.  The kernels already work plane-wise, so
    this removes every layout transpose at the op boundary (region-planar
    execution, graph/layout.py).

    ``planar_out`` decouples the OUTPUT layout from the input layout
    (default: follow ``planar``).  The fused render blend
    (graph/rewrite.py fuse_render_blend) reads NHWC operands but blends
    per-channel planes, so it asks for planes without paying an NHWC
    stack first."""
    if planar_out is None:
        planar_out = planar
    if planar:
        b, h, c, w = image.shape  # BHCW
    else:
        b, h, w, c = image.shape
    out_dtype = image.dtype
    hp, wp = _round_up(h, TH), _round_up(w, LANE)       # source staging
    if abs_pos:
        assert slab_mode and not sdelta_mode
        ho, wo = (flow.shape[1], flow.shape[3]) if planar else (
            flow.shape[1], flow.shape[2])
    else:
        ho, wo = h, w
    hp_o, wp_o = _round_up(ho, TH), _round_up(wo, LANE)  # output grid
    nt_w = wp_o // LANE

    # per-plane arithmetic packing (little-endian, identical to bitcasting
    # a u8[4] vector): the bitcast form forces a (B,H,W,4) u8 feature-minor
    # intermediate that XLA lane-pads 32x (6.4 GB at B=24); channel-plane
    # slices + shifts keep everything W-minor
    def _chan_u8(i):
        plane = image[:, :, i, :] if planar else image[..., i]
        return jnp.round(
            jnp.clip(plane.astype(jnp.float32), 0.0, 1.0) * 255.0
        ).astype(jnp.int32)

    words = _chan_u8(0)
    for ci in range(1, c):
        words = words | (_chan_u8(ci) << (8 * ci))  # (B,H,W)

    fx, fy = _flow_xy(flow, planar)
    if abs_pos:
        sx, sy = fx, fy
    else:
        gy = lax.broadcasted_iota(jnp.float32, (ho, wo), 0)
        gx = lax.broadcasted_iota(jnp.float32, (ho, wo), 1)
        sx = gx[None] + fx
        sy = gy[None] + fy
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    alpha = jnp.clip(sx - x0.astype(jnp.float32), 0.0, 1.0)
    beta = jnp.clip(sy - y0.astype(jnp.float32), 0.0, 1.0)

    def pad2(x, val=0):
        return jnp.pad(
            x, ((0, 0), (0, hp - x.shape[1]), (0, wp - x.shape[2])),
            constant_values=val,
        )

    words = pad2(words)
    # EDGE-pad the index/weight operands: zero-padding poisons the padded
    # columns' y0/x0 with 0, dragging every window's dynamic band/tile range
    # down to the frame origin — at widths that aren't lane multiples (e.g.
    # the 1088-wide transposed TTA group) the last window of every stripe
    # then walks the whole frame (measured 10x: 171 ms vs 17 ms at B=4).
    # Padded outputs are garbage and cropped; only the ranges matter.
    def pad2_edge(x):
        return jnp.pad(
            x, ((0, 0), (0, hp_o - x.shape[1]), (0, wp_o - x.shape[2])),
            mode="edge",
        )

    operands = [pad2_edge(v) for v in (y0, x0, alpha, beta)]

    grid = (b, hp_o // TH)
    img_spec = pl.BlockSpec(memory_space=pl.ANY)
    idx_spec = pl.BlockSpec(
        (1, TH, wp_o), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, TH, wp_o), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )

    if sdelta_mode:
        kernel = functools.partial(
            _warp_kernel_u8_sdelta, nt_w=nt_w, h_max=h - 1, w_max=w - 1,
            hp=hp,
        )
        scratch = [
            pltpu.VMEM((2 * TH, wp), jnp.int32),   # staged band pair (src)
            pltpu.VMEM((TH, wp_o), jnp.float32),   # acc r (output grid)
            pltpu.VMEM((TH, wp_o), jnp.float32),   # acc g
            pltpu.VMEM((TH, wp_o), jnp.float32),   # acc b
            pltpu.SemaphoreType.DMA,
        ]
        # per-(stripe, window) iteration ranges, reduced in one fused XLA
        # pass (in-kernel cross-lane reductions are the per-stripe floor).
        # Tables/outputs are sized on the OUTPUT grid (hp_o/wp_o) like the
        # sibling branches; sdelta asserts abs_pos off so they equal hp/wp.
        n_stripes = hp_o // TH
        y0p, x0p = operands[0], operands[1]
        rows = lax.broadcasted_iota(jnp.int32, (hp_o, wp_o), 0)[None]
        y1p = jnp.minimum(y0p + 1, h - 1)
        x1p = jnp.minimum(x0p + 1, w - 1)

        def sreduce(v, fn):
            # (b, nt_w, n_stripes): stripe axis last so the whole table is
            # one SMEM block per batch element
            return jnp.transpose(
                fn(v.reshape(b, n_stripes, TH, nt_w, LANE), axis=(2, 4)),
                (0, 2, 1),
            ).astype(jnp.int32)

        ranges = [
            sreduce(y0p - rows, jnp.min),
            sreduce(y1p - rows, jnp.max),
            sreduce(x0p, jnp.min) // LANE,
            sreduce(x1p, jnp.max) // LANE,
        ]
        smem_spec = pl.BlockSpec(
            (1, nt_w, n_stripes), lambda i, j: (i, 0, 0),
            memory_space=pltpu.SMEM,
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[img_spec] + [idx_spec] * 4 + [smem_spec] * 4,
            out_specs=[out_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((b, hp_o, wp_o), out_dtype)] * 3,
            scratch_shapes=scratch,
        )(words, *operands, *ranges)
        if planar_out:
            return jnp.stack(outs, axis=2)[:, :ho, :c, :wo]
        return jnp.stack(outs, axis=-1)[:, :ho, :wo, :c]
    elif slab_mode:
        import os

        # tall default: 47.84 -> 48.13 fps on the v4.6 headline
        tall = os.environ.get("RIFE_TPU_WARP_U8_TALL", "1") != "0"
        scratch = [
            pltpu.VMEM((TH, wp), jnp.int32),      # slab (source rows)
            pltpu.VMEM((TH, wp_o), jnp.float32),  # acc r (output grid)
            pltpu.VMEM((TH, wp_o), jnp.float32),  # acc g
            pltpu.VMEM((TH, wp_o), jnp.float32),  # acc b
            pltpu.SemaphoreType.DMA,
        ]
        if tall and os.environ.get("RIFE_TPU_WARP_INFLOW", "1") != "0":
            # inflow form: hand the kernel the raw sample positions; it
            # derives y0/x0/alpha/beta per stripe with the exact same f32
            # op sequence (bit-identical results).  Skips materializing +
            # edge-padding four full-res operands per warp in HBM.
            # ns output stripes share one grid cell and one band loop
            # (grid coarsening).  Default 1: the headline A/B measured
            # coarsening monotonically NEGATIVE (49.2/48.0/47.8/47.3 fps
            # at ns=1/2/4/8) — Mosaic already pipelines the per-cell fixed
            # cost across grid steps, and bigger cells reduce that overlap.
            # Kept as a measured knob for other shapes.
            ns = max(1, int(os.environ.get("RIFE_TPU_WARP_NS", "1")))
            hp_m = _round_up(ho, TH * ns)
            n_rows = hp_m // TH
            # raw-flow form: hand the kernel the flow PLANES in their graph
            # dtype (bf16) and let it add the grid iota itself — halves the
            # position-operand bytes vs f32 sx/sy and skips their pad pass
            # entirely (zero-padded flow decodes to identity positions,
            # which keeps the dynamic ranges benign; see _inkernel_corners)
            raw = not abs_pos
            if raw:
                # raw flow planes in the GRAPH dtype (_flow_xy upcasts to
                # f32 — the kernel does that conversion itself)
                if planar:
                    sx, sy = flow[:, :, 0, :], flow[:, :, 1, :]
                else:
                    sx, sy = flow[..., 0], flow[..., 1]

            def padf(v):
                return jnp.pad(
                    v,
                    ((0, 0), (0, hp_m - v.shape[1]),
                     (0, wp_o - v.shape[2])),
                    **({} if raw else {"mode": "edge"}),
                )

            kernel = functools.partial(
                _warp_kernel_u8_slab_tall_flow, nt_w=nt_w,
                h_max=h - 1, w_max=w - 1, ns=ns, raw_flow=raw,
            )
            blk = pl.BlockSpec(
                (1, ns * TH, wp_o), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            )
            scratch_m = [
                pltpu.VMEM((TH, wp), jnp.int32),           # slab
                pltpu.VMEM((ns * TH, wp_o), jnp.float32),  # acc r
                pltpu.VMEM((ns * TH, wp_o), jnp.float32),  # acc g
                pltpu.VMEM((ns * TH, wp_o), jnp.float32),  # acc b
                pltpu.SemaphoreType.DMA,
            ]
            outs = pl.pallas_call(
                kernel,
                grid=(b, n_rows // ns),
                in_specs=[img_spec] + [blk] * 2,
                out_specs=[blk] * 3,
                out_shape=[
                    jax.ShapeDtypeStruct((b, hp_m, wp_o), out_dtype)
                ] * 3,
                scratch_shapes=scratch_m,
            )(words, padf(sx), padf(sy))
            if planar_out:
                return jnp.stack(outs, axis=2)[:, :ho, :c, :wo]
            return jnp.stack(outs, axis=-1)[:, :ho, :wo, :c]
        slab_kernel = (
            _warp_kernel_u8_slab_tall if tall else _warp_kernel_u8_slab
        )
        kernel = functools.partial(
            slab_kernel, nt_w=nt_w, h_max=h - 1, w_max=w - 1
        )
    elif delta_mode:
        kernel = functools.partial(
            _warp_kernel_u8_delta, nt_w=nt_w, h_max=h - 1, w_max=w - 1
        )
        scratch = [
            # staged at +8 rows with 16 rows of bottom slack so the two
            # aligned band loads around any window stay in-bounds
            pltpu.VMEM((hp + 3 * TH, wp), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kernel = functools.partial(
            _warp_kernel_u8, nt_w=nt_w, h_max=h - 1, w_max=w - 1
        )
        scratch = [
            pltpu.VMEM((hp, wp), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec] + [idx_spec] * 4,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, hp_o, wp_o), out_dtype)] * 3,
        scratch_shapes=scratch,
    )(words, *operands)

    if planar_out:
        return jnp.stack(outs, axis=2)[:, :ho, :c, :wo]
    out = jnp.stack(outs, axis=-1)[:, :ho, :wo, :c]
    return out


def _pair_words_and_pos(image, flow, *, planar: bool, abs_pos: bool):
    """u8-quad word packing + flow/position operands for one (image, flow)
    operand pair of the PAIR kernels — the same arithmetic packing as
    `_warp_pallas_u8_impl_any`.

    abs_pos=True: returns absolute f32 sample positions (the WarpDs4 tap
    grid).  abs_pos=False: returns the RAW flow planes in their graph
    dtype — the kernel derives positions in-kernel (raw_flow mode), so the
    full-res f32 position planes are never materialized."""
    if planar:
        b, h, c, w = image.shape
    else:
        b, h, w, c = image.shape

    def _chan_u8(i):
        plane = image[:, :, i, :] if planar else image[..., i]
        return jnp.round(
            jnp.clip(plane.astype(jnp.float32), 0.0, 1.0) * 255.0
        ).astype(jnp.int32)

    words = _chan_u8(0)
    for ci in range(1, c):
        words = words | (_chan_u8(ci) << (8 * ci))  # (B,H,W)

    if planar:
        fx, fy = flow[:, :, 0, :], flow[:, :, 1, :]
    else:
        fx, fy = flow[..., 0], flow[..., 1]
    if abs_pos:
        fx = fx.astype(jnp.float32)
        fy = fy.astype(jnp.float32)
        ho, wo = fx.shape[1], fx.shape[2]
    else:
        ho, wo = h, w
    return words, fx, fy, (b, h, w, c, ho, wo)


@functools.partial(
    jax.jit,
    static_argnames=("planar", "planar_out", "blend", "abs_pos"),
)
def warp_pallas_pair(img_a, flow_a, img_b, flow_b, mask=None, *,
                     planar: bool = False, planar_out: bool | None = None,
                     blend: bool = False, abs_pos: bool = False):
    """TWO u8-origin quad-packed warps on the same output grid in ONE
    pallas_call (inflow TALL slab kernels) — one Mosaic grid walk, one
    slab/accumulator scratch set, two sequential accumulate passes.

    Without ``blend``: returns ``(warp(img_a, flow_a), warp(img_b,
    flow_b))``, each bit-identical to `warp_pallas(..., u8_origin=True)`
    on the slab/tall/inflow path.  With ``blend=True``, ``mask`` is the
    (B,Ho,Wo) fusion mask and the single blended frame
    ``wa*mask + wb*(1-mask)`` is returned — the v4 render tail
    (graph/rewrite.py fuse_render_blend) in one kernel.

    ``abs_pos=True``: the flows carry ABSOLUTE sample positions on an
    output grid smaller than the source (the fused WarpDs4 pairs).

    Callers gate on u8-quad eligibility and the slab variant; every other
    configuration should use two `warp_pallas` calls."""
    if blend and mask is None:
        raise ValueError("warp_pallas_pair(blend=True) requires the fusion "
                         "mask (B,Ho,Wo); got mask=None")
    if planar_out is None:
        planar_out = planar
    out_dtype = img_a.dtype
    words_a, sxa, sya, (b, h, w, c, ho, wo) = _pair_words_and_pos(
        img_a, flow_a, planar=planar, abs_pos=abs_pos)
    if c > 3:
        # the pair kernels accumulate and emit exactly 3 planes; a
        # 4-channel image would silently lose its alpha channel
        raise ValueError(f"warp_pallas_pair supports <=3 channels, got {c}")
    words_b, sxb, syb, _ = _pair_words_and_pos(
        img_b, flow_b, planar=planar, abs_pos=abs_pos)

    hp, wp = _round_up(h, TH), _round_up(w, LANE)
    hp_o, wp_o = _round_up(ho, TH), _round_up(wo, LANE)
    nt_w = wp_o // LANE

    import os

    # sheared (dy-walk) accumulate core: measured A/B alternative to the
    # band-tall one-hot core (tools/warp_sheared_ab.py).  raw-flow pairs
    # only — the abs_pos (WarpDs4) grids need a stride-aware dy
    # parameterization the sheared core doesn't have yet.
    raw_flow = not abs_pos
    sheared = (raw_flow and
               os.environ.get("RIFE_TPU_WARP_SHEARED", "1") != "0")
    # sheared OUTPUT STRIPE height: one grid step covers ts output rows.
    # Taller stripes amortize per-step fixed costs (corners chain, window
    # reductions, fori_loop scalar bookkeeping, DMA issue) over more
    # pixels — the per-(8,128) inner iteration is overhead-bound.
    # Measured (tools/warp_sheared_ab.py, 1080p B=24, bit-exact): ts=8
    # 1.02x vs the tall kernels, ts=32 2.23x, ts=64 2.45x pair / 2.57x
    # render (and iid 1.11x); ts=128 exceeds the 16M VMEM scoped limit.
    ts = TH
    if sheared:
        ts = max(TH, int(os.environ.get("RIFE_TPU_WARP_TS", "64")))
        # no stripe taller than the (TH-padded) frame
        ts = min(_round_up(ts, TH), _round_up(ho, TH))
        hp_o = _round_up(ho, ts)  # grid rows must tile the stripe height
    # nb (staging depth, in TH-row bands) is rounded up to a power of two:
    # Mosaic's DYNAMIC sublane roll is only correct when the rolled block
    # is a power-of-two number of vregs (measured: a (24,128) i32 block
    # mis-rotates for every nonzero shift while (16,128)/(32,128) are
    # exact).  It must also hold at least 2 stripes so each chunk serves
    # a non-empty dy range.
    nb_req = max(2 * ts // TH,
                 int(os.environ.get("RIFE_TPU_WARP_NB", "4")))
    nb = 1 << (nb_req - 1).bit_length()

    def pad_src(x):
        return jnp.pad(
            x, ((0, 0), (0, hp - x.shape[1]), (0, wp - x.shape[2])))

    def pad_edge(v):
        return jnp.pad(
            v, ((0, 0), (0, hp_o - v.shape[1]), (0, wp_o - v.shape[2])),
            mode="edge")

    def pad_zero(v):
        # raw-flow operands pad with ZEROS: padded entries decode to
        # identity sample positions in-kernel (benign for the dynamic
        # ranges), and on lane/sublane-aligned frames (the 1080p headline)
        # this pad is a no-op the compiler drops entirely
        return jnp.pad(
            v, ((0, 0), (0, hp_o - v.shape[1]), (0, wp_o - v.shape[2])))

    words_a, words_b = pad_src(words_a), pad_src(words_b)
    pad_pos = pad_zero if raw_flow else pad_edge
    pos = [pad_pos(v) for v in (sxa, sya, sxb, syb)]

    img_spec = pl.BlockSpec(memory_space=pl.ANY)
    blk = pl.BlockSpec(
        (1, ts, wp_o), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    grid = (b, hp_o // ts)
    slab_shape = (nb * TH, wp) if sheared else (TH, wp)
    scratch = [
        pltpu.VMEM(slab_shape, jnp.int32),    # slab (shared, sequential)
        pltpu.VMEM((ts, wp_o), jnp.float32),  # acc r
        pltpu.VMEM((ts, wp_o), jnp.float32),  # acc g
        pltpu.VMEM((ts, wp_o), jnp.float32),  # acc b
    ]

    if blend:
        if sheared:
            kernel = functools.partial(
                _warp_kernel_u8_sheared_flow_render,
                nt_w=nt_w, h_max=h - 1, w_max=w - 1, nb=nb, ts=ts,
                raw_flow=raw_flow)
        else:
            kernel = functools.partial(
                _warp_kernel_u8_slab_tall_flow_render,
                nt_w=nt_w, h_max=h - 1, w_max=w - 1, raw_flow=raw_flow)
        scratch = scratch + [
            pltpu.VMEM((ts, wp_o), out_dtype),  # stash: warp_m planes
            pltpu.VMEM((ts, wp_o), out_dtype),
            pltpu.VMEM((ts, wp_o), out_dtype),
            pltpu.SemaphoreType.DMA,
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[img_spec] * 2 + [blk] * 5,
            out_specs=[blk] * 3,
            out_shape=[jax.ShapeDtypeStruct((b, hp_o, wp_o), out_dtype)] * 3,
            scratch_shapes=scratch,
        )(words_a, words_b, *pos, pad_edge(mask.astype(out_dtype)))
        if planar_out:
            return jnp.stack(outs, axis=2)[:, :ho, :c, :wo]
        return jnp.stack(outs, axis=-1)[:, :ho, :wo, :c]

    if sheared:
        kernel = functools.partial(
            _warp_kernel_u8_sheared_flow_pair,
            nt_w=nt_w, h_max=h - 1, w_max=w - 1, nb=nb, ts=ts,
            raw_flow=raw_flow)
    else:
        kernel = functools.partial(
            _warp_kernel_u8_slab_tall_flow_pair,
            nt_w=nt_w, h_max=h - 1, w_max=w - 1, raw_flow=raw_flow)
    scratch = scratch + [pltpu.SemaphoreType.DMA]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec] * 2 + [blk] * 4,
        out_specs=[blk] * 6,
        out_shape=[jax.ShapeDtypeStruct((b, hp_o, wp_o), out_dtype)] * 6,
        scratch_shapes=scratch,
    )(words_a, words_b, *pos)

    def fin(three):
        if planar_out:
            return jnp.stack(three, axis=2)[:, :ho, :c, :wo]
        return jnp.stack(three, axis=-1)[:, :ho, :wo, :c]

    return fin(outs[:3]), fin(outs[3:])


@functools.partial(jax.jit, static_argnames=("planar",))
def warp_pallas_ds4_pair(img_a, flow_a, img_b, flow_b, *,
                         planar: bool = False):
    """Both fused warp+1/4-downscale taps of a v4 block entry in ONE
    pallas_call on the sheared phase-split core, emitting the FINAL
    (B, H/4, W/4, C) downsampled pair directly.

    vs the tall abs_pos pair (warp_pallas_pair(abs_pos=True) + two
    ``_downsample_axis`` passes — the round-4 default): no (H/2, W/2)
    absolute-position planes are ever materialized (the kernel derives
    each tap's positions from the four sliced flow quadrants in-kernel),
    the (H/2, W/2) warped tensors and both downsample passes disappear
    (the epilogue replays their exact storage-dtype 0.5/0.5 averages).

    MEASURED NET-NEGATIVE and off by default (tools/warp_ds4_ab.py, B=24
    1080p, bit-exact at every row): 175 vs 49 ms smooth, 329 vs 144 ms
    iid.  The stride-4 tap grid defeats the sheared structure twice over:
    each output lane-tile spans ~4-5 source tiles (LANE outputs cover
    4*LANE source columns, so gather density is ~25%), and the 4
    tap-quadrant walks multiply the per-stripe fori_loop count ~12x over
    the stride-1 sheared kernel — the scalar iteration overhead, not the
    vector work, dominates.  The tall one-hot core (which serves 8
    candidate source rows per visit) is the right shape for stride-4
    spans and keeps the ds4 default.
    Graph sites: /root/reference/models/rife-v4.6/flownet.param
    warp_0/warp_1 -> cat_3 -> upsample_12 (and per-block siblings)."""
    if planar:
        b, h, c, w = img_a.shape
    else:
        b, h, w, c = img_a.shape
    assert h % 4 == 0 and w % 4 == 0, "ds4 pair requires 4-aligned frames"
    if c > 3:
        raise ValueError(f"warp_pallas_ds4_pair supports <=3 channels, "
                         f"got {c}")
    out_dtype = img_a.dtype

    def pack_words(image):
        def chan(i):
            plane = image[:, :, i, :] if planar else image[..., i]
            return jnp.round(
                jnp.clip(plane.astype(jnp.float32), 0.0, 1.0) * 255.0
            ).astype(jnp.int32)

        words = chan(0)
        for ci in range(1, c):
            words = words | (chan(ci) << (8 * ci))
        return words

    import os

    ho_f, wo_f = h // 4, w // 4
    ts = max(TH, int(os.environ.get("RIFE_TPU_WARP_DS4_TS", "64")))
    ts = min(_round_up(ts, TH), _round_up(ho_f, TH))
    hp_o = _round_up(ho_f, ts)
    wp_o = _round_up(wo_f, LANE)
    nt_w = wp_o // LANE
    nb_req = max(2 * ts // TH,
                 int(os.environ.get("RIFE_TPU_WARP_DS4_NB", "4")))
    nbq = 1 << (nb_req - 1).bit_length()

    # phase-split u8-quad source: (B, 4, hq, wp), plane p = rows = p (mod 4)
    hp = _round_up(h, 4 * TH)
    wp = _round_up(w, LANE)

    def split_phases(image):
        words = pack_words(image)
        words = jnp.pad(
            words, ((0, 0), (0, hp - h), (0, wp - w)))
        return words.reshape(b, hp // 4, 4, wp).transpose(0, 2, 1, 3)

    def tap_flows(flow):
        if planar:
            fx, fy = flow[:, :, 0, :], flow[:, :, 1, :]
        else:
            fx, fy = flow[..., 0], flow[..., 1]
        planes = []
        for ta in range(2):
            for tb in range(2):
                for v in (fx, fy):
                    q = v[:, 1 + ta :: 4, 1 + tb :: 4]
                    planes.append(jnp.pad(
                        q, ((0, 0), (0, hp_o - q.shape[1]),
                            (0, wp_o - q.shape[2]))))
        return planes

    img_spec = pl.BlockSpec(memory_space=pl.ANY)
    blk = pl.BlockSpec(
        (1, ts, wp_o), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    grid = (b, hp_o // ts)
    scratch = (
        [pltpu.VMEM((nbq * TH, wp), jnp.int32) for _ in range(4)]
        + [pltpu.VMEM((ts, wp_o), jnp.float32) for _ in range(12)]
        + [pltpu.SemaphoreType.DMA]
    )
    kernel = functools.partial(
        _warp_kernel_u8_sheared_ds4_pair,
        nt_w=nt_w, h_max=h - 1, w_max=w - 1, nbq=nbq, ts=ts)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec] * 2 + [blk] * 16,
        out_specs=[blk] * 6,
        out_shape=[jax.ShapeDtypeStruct((b, hp_o, wp_o), out_dtype)] * 6,
        scratch_shapes=scratch,
    )(split_phases(img_a), split_phases(img_b),
      *tap_flows(flow_a), *tap_flows(flow_b))

    def fin(three):
        if planar:
            return jnp.stack(three, axis=2)[:, :ho_f, :c, :wo_f]
        return jnp.stack(three, axis=-1)[:, :ho_f, :wo_f, :c]

    return fin(outs[:3]), fin(outs[3:])


def warp_pallas_spatial(image, pos, mesh, axis: str, *,
                        batch_axis: Optional[str] = None,
                        u8_origin: bool = True, variant: str = "auto",
                        planar_out: bool = False):
    """Height-sharded backward warp on the Pallas slab kernel.

    ``image``/``pos`` are GLOBAL (B,H,W,C)/(B,Ho,Wo,2) arrays height-
    sharded over mesh axis ``axis`` (``pos`` carries ABSOLUTE (sx, sy)
    sample positions, like ``abs_pos`` mode).  Inside a shard_map each
    shard all-gathers the source rows over ICI and evaluates the slab
    kernel on ITS OWN output rows only — the gather work shards
    perfectly, and exactness needs no static halo bound: a backward warp
    may read ANY source row (the flow is data), so the only exact
    "margin" is the whole frame.  The all-gather is the u8 source frame
    (bytes-per-pixel small next to the activations GSPMD keeps sharded);
    the slab kernel then streams only the bands each shard's flow
    actually touches.  Replaces the ``use_pallas=False`` XLA-gather
    fallback that made spatially-sharded warps ~1000x off Pallas cost
    (BASELINE.md round-1: 44 s vs 17 ms for one 4K warp).
    Reference long-frame analog: /root/reference/src/rife.cpp:294-332
    (UHD mode); multi-GPU loop main.cpp:819-866."""
    from jax.sharding import PartitionSpec as SP

    spec = SP(batch_axis, axis, None, None)

    def local(img, ps):
        full = lax.all_gather(img, axis, axis=1, tiled=True)
        return warp_pallas(full, ps, u8_origin=u8_origin,
                           u8_variant=variant, abs_pos=True,
                           planar_out=planar_out)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec),
        out_specs=spec, check_vma=False,
    )(image, pos)


def fits_vmem(h: int, w: int) -> bool:
    return _round_up(h, TH) * _round_up(w, LANE) * 4 <= _VMEM_IMAGE_LIMIT


@functools.partial(
    jax.jit, static_argnames=("u8_origin", "u8_variant", "abs_pos", "planar",
                              "planar_out")
)
def warp_pallas(image, flow, u8_origin: bool = False,
                u8_variant: str = "auto", abs_pos: bool = False,
                planar: bool = False, planar_out: bool | None = None):
    """Backward bilinear warp (B,H,W,C) x (B,H,W,2), shader-exact.

    ``planar=True``: image/flow/output are BHCW channel-slab planes —
    (B,H,C,W) x (B,Ho,2,Wo) -> (B,Ho,C,Wo).  Bit-identical math; the
    kernels operate plane-wise either way, so planar mode only changes the
    (cheap) host-side slicing/stacking and removes the layout transposes at
    the boundary (BHCW is also the planar conv kernel's native diet).

    ``u8_origin=True`` asserts the image values are u8/255 (the input
    frames and their Split copies) — those take the lossless u8-quad kernels
    (4 channels per i32 gather word, one plane per batch element):

    * ``delta`` (default while the image fits VMEM) — the delta-roll kernel,
      whose iteration count is the stripe's exact y-spread: fastest at the
      smooth flows trained RIFE weights produce, parity at white-noise ones;
    * ``band``  — the row-band one-hot kernel (kept for comparison and as
      the building block of the slab variant);
    * ``slab``  — band-looped slab streaming at any size (UHD/4K: 17 ms vs
      the XLA gather's 44 s).

    Otherwise bf16 images take the pair-packed kernel (2 channels per word)
    and other dtypes the per-plane f32 kernel; both require the plane to fit
    VMEM (callers fall back to the XLA gather).

    ``abs_pos=True``: ``flow`` carries ABSOLUTE sample positions (sx, sy)
    on an output grid flow.shape[1:3] that may be smaller than the source
    grid — the fused downscaled-warp rewrite (graph/rewrite.py) evaluates
    the warp only on the Interp tap pixels.  u8-origin images take the slab
    streaming variant (staging decoupled from the output grid); bf16/f32
    take the VMEM-resident kernels, whose source staging is already
    independent of the output windows.

    ``planar_out`` (u8 path only; default follows ``planar``) requests
    plane-form (B,Ho,C,Wo) output from NHWC operands — used by the fused
    render blend so the result never materializes lane-padded NHWC."""
    n_chan = image.shape[2] if planar else image.shape[-1]

    def _fix_out(out):
        # bf16/f32 impls emit in the input layout; emulate planar_out by a
        # transpose (0,1,3,2) — (B,Ho,Wo,C) <-> (B,Ho,C,Wo)
        if planar_out is None or planar_out == planar:
            return out
        return out.transpose(0, 1, 3, 2)

    if abs_pos:
        if u8_origin and n_chan <= 3:
            return _warp_pallas_u8_impl_any(
                image, flow, slab_mode=True, abs_pos=True, planar=planar,
                planar_out=planar_out,
            )
        if image.dtype == jnp.bfloat16:
            return _fix_out(_warp_pallas_packed_impl(image, flow,
                                                     abs_pos=True,
                                                     planar=planar))
        return _fix_out(_warp_pallas_impl(image, flow, abs_pos=True,
                                          planar=planar))
    if u8_origin and n_chan <= 3:
        variant = u8_variant
        if variant == "auto":
            # slab wins in-graph at the smooth flows real RIFE weights
            # produce (headline step 43.8 vs band's 40.8 fps at 1080p B=24:
            # no whole-image VMEM staging, bands stream on demand) and is
            # the only variant with no VMEM ceiling.  Worst-case flows
            # (white noise) degrade any flow-adaptive variant (band 8.9 s,
            # slab 19 s per B=24 step) — that case never occurs with
            # trained weights on real frames; RIFE_TPU_WARP_VARIANT
            # overrides the choice for experiments.
            variant = "slab"
        return _warp_pallas_u8_impl_any(
            image, flow,
            slab_mode=variant == "slab",
            delta_mode=variant == "delta",
            sdelta_mode=variant == "sdelta",
            planar=planar,
            planar_out=planar_out,
        )
    if image.dtype == jnp.bfloat16:
        return _fix_out(_warp_pallas_packed_impl(image, flow, planar=planar))
    return _fix_out(_warp_pallas_impl(image, flow, planar=planar))
