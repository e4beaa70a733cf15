"""Pallas warp kernel vs the NumPy shader oracle (interpreter mode on CPU).

The real-TPU path was validated on hardware (max err 5.5e-06 vs the XLA
warp); these tests pin the kernel's semantics in CI without a TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rife_tpu.ops import numpy_ref
from rife_tpu.ops.warp_pallas import fits_vmem, warp_pallas

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("shape,scale", [
    ((1, 16, 128, 2), 6),
    ((1, 8, 128, 1), 100),   # extreme flow: full clamping everywhere
])
def test_warp_pallas_matches_oracle(shape, scale):
    """Interpreter mode is pure Python and slow — shapes stay tiny; the
    real-TPU path was additionally validated on hardware at 256x384."""
    b, h, w, c = shape
    img = RNG.normal(size=shape).astype(np.float32)
    flow = (RNG.normal(size=(b, h, w, 2)) * scale).astype(np.float32)
    ref = numpy_ref.warp(img, flow)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(warp_pallas(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_warp_pallas_zero_flow_identity():
    img = RNG.normal(size=(1, 8, 128, 1)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            warp_pallas(jnp.asarray(img), jnp.zeros((1, 8, 128, 2)))
        )
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_fits_vmem_thresholds():
    assert fits_vmem(1088, 1920)       # 1080p padded: the design target
    assert not fits_vmem(2176, 3840)   # 4K falls back to the XLA path


def test_warp_pallas_u8_quad():
    """u8-origin images take the quad-packed kernel (4 u8 channels per i32
    gather word).  Packing is lossless for u8/255 values, so the result
    matches the f32 oracle to float rounding."""
    u8 = RNG.integers(0, 256, (1, 16, 128, 3)).astype(np.uint8)
    img = (u8.astype(np.float32) / 255.0).astype(np.float32)
    flow = (RNG.normal(size=(1, 16, 128, 2)) * 5).astype(np.float32)
    ref = numpy_ref.warp(img, flow)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            warp_pallas(jnp.asarray(img), jnp.asarray(flow), u8_origin=True)
        )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["band", "delta", "sdelta"])
@pytest.mark.parametrize("scale", [5, 60])  # 60 px at 16 rows: heavy clamping
def test_warp_pallas_u8_variants_match_oracle(variant, scale):
    """Both u8-quad kernels (row-band one-hot and delta-roll) are
    shader-exact, including at borders where y0/y1 clamp."""
    u8 = RNG.integers(0, 256, (1, 16, 128, 3)).astype(np.uint8)
    img = (u8.astype(np.float32) / 255.0).astype(np.float32)
    flow = (RNG.normal(size=(1, 16, 128, 2)) * scale).astype(np.float32)
    ref = numpy_ref.warp(img, flow)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            warp_pallas(jnp.asarray(img), jnp.asarray(flow),
                        u8_origin=True, u8_variant=variant)
        )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_warp_pallas_u8_quad_bf16_roundtrip():
    """bf16 storage of u8/255 values still recovers the exact u8 on requant
    (|bf16 rel err| < 2^-9 keeps round(v*255) exact for all 256 codes)."""
    u8 = RNG.integers(0, 256, (1, 8, 128, 3)).astype(np.uint8)
    img = jnp.asarray(u8.astype(np.float32) / 255.0).astype(jnp.bfloat16)
    ref = numpy_ref.warp(
        u8.astype(np.float32) / 255.0, np.zeros((1, 8, 128, 2), np.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            warp_pallas(img, jnp.zeros((1, 8, 128, 2)), u8_origin=True),
            np.float32,
        )
    # the exact u8 is recovered internally; the only error left is the final
    # cast back to the bf16 activation dtype
    np.testing.assert_allclose(
        got, np.asarray(jnp.asarray(ref).astype(jnp.bfloat16), np.float32),
        atol=1e-6,
    )


def test_warp_pallas_u8_slab_streaming():
    """The slab-streaming u8 variant (images beyond the VMEM ceiling — UHD)
    must match the oracle exactly like the resident variant."""
    from rife_tpu.ops.warp_pallas import _warp_pallas_u8_impl_any

    u8 = RNG.integers(0, 256, (1, 24, 256, 3)).astype(np.uint8)
    img = u8.astype(np.float32) / 255.0
    flow = (RNG.normal(size=(1, 24, 256, 2)) * 7).astype(np.float32)
    ref = numpy_ref.warp(img, flow)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            _warp_pallas_u8_impl_any(
                jnp.asarray(img), jnp.asarray(flow), slab_mode=True
            )
        )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_warp_pallas_packed_bf16():
    """bf16 inputs dispatch to the pair-packed kernel (2 channels per i32
    gather word); it unpacks to f32 internally, so the only error vs the f32
    oracle is the bf16 input rounding itself."""
    img = RNG.normal(size=(1, 16, 128, 3)).astype(np.float32)
    flow = (RNG.normal(size=(1, 16, 128, 2)) * 5).astype(np.float32)
    img_b = jnp.asarray(img).astype(jnp.bfloat16)
    flow_b = jnp.asarray(flow).astype(jnp.bfloat16)
    ref = numpy_ref.warp(
        np.asarray(img_b, np.float32), np.asarray(flow_b, np.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(warp_pallas(img_b, flow_b), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2)  # bf16 input rounding


@pytest.mark.parametrize("dtype,u8", [
    ("float32", False),   # f32 per-plane kernel
    ("bfloat16", False),  # pair-packed kernel
    ("float32", True),    # u8-quad slab streaming
])
def test_warp_pallas_abs_pos_decoupled_grid(dtype, u8):
    """abs_pos mode: the warp is evaluated at caller-given ABSOLUTE positions
    on an output grid smaller than the source (the fused downscaled-warp
    rewrite's compacted tap grid, graph/rewrite.py).  Must match the XLA
    ``warp_at`` gather at the same positions."""
    from rife_tpu.ops import jax_ops

    h, w = 16, 256
    if u8:
        raw = RNG.integers(0, 256, (1, h, w, 3)).astype(np.uint8)
        img = jnp.asarray(raw.astype(np.float32) / 255.0)
    else:
        img = jnp.asarray(RNG.uniform(0, 1, (1, h, w, 3)), dtype)
    # compacted 1/4-downsample tap grid rows/cols {4i+1, 4i+2} + a flow
    ho, wo = h // 2, w // 2
    iy = np.arange(ho)
    ix = np.arange(wo)
    gy = (iy // 2) * 4 + 1 + (iy % 2)
    gx = (ix // 2) * 4 + 1 + (ix % 2)
    fl = (RNG.normal(size=(1, ho, wo, 2)) * 4).astype(np.float32)
    pos = np.stack(
        [gx[None, None, :] + fl[..., 0], gy[None, :, None] + fl[..., 1]],
        axis=-1,
    ).astype(np.float32)
    pos_j = jnp.asarray(pos)
    ref = jax_ops.warp_at(
        img.astype(jnp.float32), pos_j[..., 1], pos_j[..., 0]
    )
    with pltpu.force_tpu_interpret_mode():
        got = warp_pallas(img, pos_j, u8_origin=u8, abs_pos=True)
    assert got.shape == (1, ho, wo, 3)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2 if dtype == "bfloat16" else 1e-5,
    )


def test_arithmetic_word_packing_matches_bitcast():
    """The warp drivers build gather words with per-plane shifts; pin them
    against the vector-bitcast formulation they replaced (little-endian:
    channel 0 in the low bits), for both the u8 quad and the bf16 pair."""
    from jax import lax

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (2, 4, 8, 4)).astype(np.uint8)
    img = jnp.asarray(raw.astype(np.float32) / 255.0)

    # u8 quad: bitcast reference
    ref = lax.bitcast_convert_type(jnp.asarray(raw), jnp.int32)
    got = None
    for ci in range(4):
        ch = jnp.round(
            jnp.clip(img[..., ci].astype(jnp.float32), 0, 1) * 255.0
        ).astype(jnp.int32)
        got = ch if got is None else got | (ch << (8 * ci))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # bf16 pair
    vals = jnp.asarray(rng.normal(size=(2, 4, 8, 2)), jnp.bfloat16)
    ref2 = lax.bitcast_convert_type(vals, jnp.int32)
    lo = lax.bitcast_convert_type(vals[..., 0], jnp.uint16).astype(jnp.int32)
    hi = lax.bitcast_convert_type(vals[..., 1], jnp.uint16).astype(jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(lo | (hi << 16)), np.asarray(ref2))


@pytest.mark.parametrize("c", [32, 64, 6])
def test_warp_pallas_packed_bf16_multichannel(c):
    """Wide bf16 channel counts take the multi-channel shared-index kernel
    (one stripe pass serves all channel words; groups split the grid when
    2*gs accumulators would exceed the register budget).  Exactness vs the
    f32 oracle on the bf16-rounded inputs, like the pair test."""
    img = RNG.normal(size=(2, 24, 256, c)).astype(np.float32)
    flow = (RNG.normal(size=(2, 24, 256, 2)) * 6).astype(np.float32)
    img_b = jnp.asarray(img).astype(jnp.bfloat16)
    flow_b = jnp.asarray(flow).astype(jnp.bfloat16)
    ref = numpy_ref.warp(
        np.asarray(img_b, np.float32), np.asarray(flow_b, np.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(warp_pallas(img_b, flow_b), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2)


@pytest.mark.parametrize("u8,c", [(True, 3), (False, 3), (False, 32)])
def test_warp_pallas_planar_matches_nhwc(u8, c):
    """planar (BHCW) mode must agree exactly with NHWC mode on transposed
    operands — it is the layout the planar executors feed the kernels on
    TPU (u8-quad image warps and the multi-channel ctx feature warps)."""
    if u8:
        img = (RNG.integers(0, 256, (2, 24, 256, c)).astype(np.float32)
               / 255.0)
    else:
        img = RNG.normal(size=(2, 24, 256, c)).astype(np.float32)
    flow = (RNG.normal(size=(2, 24, 256, 2)) * 6).astype(np.float32)
    img_b = jnp.asarray(img).astype(jnp.bfloat16)
    flow_b = jnp.asarray(flow).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(
            warp_pallas(img_b, flow_b, u8_origin=u8), np.float32)
        got = np.asarray(
            warp_pallas(
                img_b.transpose(0, 1, 3, 2), flow_b.transpose(0, 1, 3, 2),
                u8_origin=u8, planar=True,
            ),
            np.float32,
        ).transpose(0, 1, 3, 2)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("planar", [False, True])
def test_warp_ds2_pallas_bit_exact_vs_composed(planar):
    """The fused warp+1/2-downsample kernel must be BIT-identical to the
    unfused composition (warp_pallas then the h/w 0.5-lerp chain) in the
    storage dtype — the kernel epilogue replays the unfused rounding."""
    from rife_tpu.ops import jax_ops
    from rife_tpu.ops.warp_pallas import warp_ds2_pallas

    u8 = RNG.integers(0, 256, (2, 16, 256, 3)).astype(np.uint8)
    img = jnp.asarray(u8.astype(np.float32) / 255.0).astype(jnp.bfloat16)
    flow = jnp.asarray((RNG.normal(size=(2, 16, 256, 2)) * 6).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        full = warp_pallas(img, flow, u8_origin=True, u8_variant="slab")
    ref = jax_ops.resize2d(full, 8, 128)
    if planar:
        img_p = img.transpose(0, 1, 3, 2)       # BHCW
        flow_p = flow.transpose(0, 1, 3, 2)
        with pltpu.force_tpu_interpret_mode():
            got = warp_ds2_pallas(img_p, flow_p, planar=True)
        assert got.shape == (2, 8, 3, 128)
        got = got.transpose(0, 1, 3, 2)
    else:
        with pltpu.force_tpu_interpret_mode():
            got = warp_ds2_pallas(img, flow)
        assert got.shape == (2, 8, 128, 3)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_warp_ds2_pallas_matches_oracle_f32():
    """f32 end check vs the NumPy shader oracle + exact half-pixel 1/2
    downsample (rows then cols, 0.5/0.5 taps)."""
    from rife_tpu.ops.warp_pallas import warp_ds2_pallas

    u8 = RNG.integers(0, 256, (1, 16, 128, 3)).astype(np.uint8)
    img = u8.astype(np.float32) / 255.0
    flow = (RNG.normal(size=(1, 16, 128, 2)) * 60).astype(np.float32)  # clamps
    full = numpy_ref.warp(img, flow)
    ref = full[:, 0::2] * 0.5 + full[:, 1::2] * 0.5
    ref = ref[:, :, 0::2] * 0.5 + ref[:, :, 1::2] * 0.5
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(warp_ds2_pallas(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_warp_pallas_slab_inflow_matches_driver_form():
    """The inflow tall slab kernel (indices computed in-kernel from the
    absolute sample positions) is bit-identical to the driver form that
    materializes y0/x0/alpha/beta in HBM, in both relative-flow and
    abs_pos modes and at lane-unaligned widths."""
    import os

    from rife_tpu.ops import warp_pallas as WP

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 256, (2, 40, 200, 3)) / 255.0,
                      jnp.bfloat16)
    flow = jnp.asarray(rng.normal(size=(2, 40, 200, 2)) * 7, jnp.bfloat16)
    ho, wo = 20, 100
    iy = jnp.broadcast_to(
        jnp.arange(ho, dtype=jnp.float32)[:, None] * 2 + 0.5, (ho, wo))
    ix = jnp.broadcast_to(
        jnp.arange(wo, dtype=jnp.float32)[None] * 2 + 0.5, (ho, wo))
    pos = jnp.stack([ix, iy], axis=-1)[None] + jnp.asarray(
        rng.normal(size=(2, ho, wo, 2)) * 3, jnp.float32)

    prev = os.environ.get("RIFE_TPU_WARP_INFLOW")
    try:
        cases = [
            dict(args=(img, flow), kw=dict(slab_mode=True)),
            dict(args=(img, pos), kw=dict(slab_mode=True, abs_pos=True)),
            dict(args=(img, pos),
                 kw=dict(slab_mode=True, abs_pos=True, planar_out=True)),
        ]
        for case in cases:
            with pltpu.force_tpu_interpret_mode():
                os.environ["RIFE_TPU_WARP_INFLOW"] = "0"
                a = np.asarray(
                    WP._warp_pallas_u8_impl_any(*case["args"], **case["kw"]),
                    np.float32)
                os.environ["RIFE_TPU_WARP_INFLOW"] = "1"
                b = np.asarray(
                    WP._warp_pallas_u8_impl_any(*case["args"], **case["kw"]),
                    np.float32)
            np.testing.assert_array_equal(b, a)
    finally:
        if prev is None:
            os.environ.pop("RIFE_TPU_WARP_INFLOW", None)
        else:
            os.environ["RIFE_TPU_WARP_INFLOW"] = prev


def test_warp_ds4_pair_sheared_bit_exact_vs_composed():
    """The sheared phase-split WarpDs4Pair kernel (off by default —
    measured net-negative, BASELINE.md round-5) must stay BIT-identical
    to the composed default it gates against: tall abs_pos pair on the
    `_ds4_abs_positions` tap grid + the two `_downsample_axis` passes.
    Shape is 4-aligned but lane/stripe-unaligned (final grid 6x25)."""
    from rife_tpu.ops import jax_ops
    from rife_tpu.ops.warp_pallas import warp_pallas_ds4_pair, warp_pallas_pair

    b, h, w = 2, 24, 100
    img_a = jnp.asarray(
        RNG.integers(0, 256, (b, h, w, 3)).astype(np.float32) / 255.0
    ).astype(jnp.bfloat16)
    img_b = jnp.asarray(
        RNG.integers(0, 256, (b, h, w, 3)).astype(np.float32) / 255.0
    ).astype(jnp.bfloat16)
    flow_a = jnp.asarray(
        (RNG.normal(size=(b, h, w, 2)) * 5).astype(np.float32)
    ).astype(jnp.bfloat16)
    flow_b = jnp.asarray(
        (RNG.normal(size=(b, h, w, 2)) * 9).astype(np.float32)
    ).astype(jnp.bfloat16)

    sxa, sya = jax_ops._ds4_abs_positions(img_a, flow_a)
    sxb, syb = jax_ops._ds4_abs_positions(img_b, flow_b)
    with pltpu.force_tpu_interpret_mode():
        y_a, y_b = warp_pallas_pair.__wrapped__(
            img_a, jnp.stack([sxa, sya], -1),
            img_b, jnp.stack([sxb, syb], -1), abs_pos=True)
    ds = jax_ops._downsample_axis
    ref_a = ds(ds(y_a, 2, 1), 2, 2)
    ref_b = ds(ds(y_b, 2, 1), 2, 2)

    with pltpu.force_tpu_interpret_mode():
        got_a, got_b = warp_pallas_ds4_pair.__wrapped__(
            img_a, flow_a, img_b, flow_b)
    assert got_a.shape == (b, h // 4, w // 4, 3)
    np.testing.assert_array_equal(
        np.asarray(got_a, np.float32), np.asarray(ref_a, np.float32))
    np.testing.assert_array_equal(
        np.asarray(got_b, np.float32), np.asarray(ref_b, np.float32))
