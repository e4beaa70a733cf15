"""Planar (BHCW) Pallas conv kernel vs the XLA reference.

``conv_planar`` takes/returns BHCW (B, H, C, W) — the kernel's native
layout (each row a contiguous channel slab); the XLA reference stays NCHW,
so tests transpose at the boundary.

The kernel targets the zoo's narrow-channel layers (C <= 32), where
XLA:TPU's feature-minor lane-padded layouts cost 10-40x HBM bloat
(measured: 3x3 s2 12->32 @1088x1920 = 35.8 ms/conv at B=24 — see
tools/conv_chain.py / tools/nchw_exp.py / BASELINE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from rife_tpu.ops.conv_planar import (
    ACT_LEAKY,
    ACT_NONE,
    ACT_RELU,
    conv_planar,
    conv_planar_ref,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("cin,cout,h,w,stride,act", [
    (12, 32, 16, 256, 1, ACT_LEAKY),   # v4 block3 encoder shape class
    (12, 32, 16, 256, 2, ACT_LEAKY),   # same, stride 2 (phase remap)
    (5, 7, 16, 200, 1, ACT_NONE),      # ragged channels + non-128 width
    (16, 24, 24, 384, 2, ACT_RELU),
    (8, 8, 8, 128, 1, ACT_NONE),       # minimal
])
def test_conv_planar_matches_xla(cin, cout, h, w, stride, act):
    x = jnp.asarray(RNG.standard_normal((2, cin, h, w), dtype=np.float32))
    k = jnp.asarray(
        RNG.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.2)
    b = jnp.asarray(RNG.standard_normal((cout,), dtype=np.float32))
    ref = conv_planar_ref(x, k, b, stride=stride, act=act)
    with pltpu.force_tpu_interpret_mode():
        got = conv_planar(
            x.transpose(0, 2, 1, 3), k, b, stride=stride, act=act
        ).transpose(0, 2, 1, 3)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=1e-4,
    )


def test_conv_planar_no_bias():
    x = jnp.asarray(RNG.standard_normal((1, 4, 16, 128), dtype=np.float32))
    k = jnp.asarray(
        RNG.standard_normal((3, 3, 4, 6), dtype=np.float32) * 0.2)
    ref = conv_planar_ref(x, k, None)
    with pltpu.force_tpu_interpret_mode():
        got = conv_planar(
            x.transpose(0, 2, 1, 3), k, None
        ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=1e-4,
    )


def test_conv_planar_zero_pad_edges():
    """Edge pixels must see conv zero-padding, not garbage slack."""
    x = jnp.ones((1, 3, 16, 128), jnp.float32)
    k = jnp.ones((3, 3, 3, 2), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            conv_planar(x.transpose(0, 2, 1, 3), k, None).transpose(
                0, 2, 1, 3
            ),
            np.float32,
        )
    # interior: 27; edge row/col: 18; corner: 12
    assert got[0, 0, 8, 64] == 27.0
    assert got[0, 0, 0, 64] == 18.0
    assert got[0, 0, 0, 0] == 12.0
    assert got[0, 1, 15, 127] == 12.0


@pytest.mark.parametrize("cin,cout,h,w,act", [
    (12, 32, 16, 256, ACT_LEAKY),   # v4 block encoder class
    (3, 32, 34, 120, ACT_NONE),     # ragged C, unaligned W, odd out_h
    (10, 48, 16, 960, ACT_LEAKY),   # v2 flownet Conv_177 class
    (8, 8, 8, 128, ACT_NONE),       # single row tile (n_h == 1)
])
def test_conv_s2_direct_matches_packed_path(cin, cout, h, w, act):
    """The direct stride-2 kernel (in-kernel H phases, no host pad/reshape
    prolog) must match both the XLA reference and the packed-phase kernel."""
    import os

    x = jnp.asarray(RNG.standard_normal((2, cin, h, w), dtype=np.float32))
    k = jnp.asarray(
        RNG.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.2)
    b = jnp.asarray(RNG.standard_normal((cout,), dtype=np.float32))
    ref = conv_planar_ref(x, k, b, stride=2, act=act)
    xp = x.transpose(0, 2, 1, 3)
    with pltpu.force_tpu_interpret_mode():
        got = conv_planar(xp, k, b, stride=2, act=act).transpose(0, 2, 1, 3)
        os.environ["RIFE_TPU_S2_DIRECT"] = "0"
        try:
            packed = conv_planar(
                xp, k, b, stride=2, act=act).transpose(0, 2, 1, 3)
        finally:
            del os.environ["RIFE_TPU_S2_DIRECT"]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(packed, np.float32),
        atol=1e-5)


@pytest.mark.parametrize("cin,cout,h,w,act", [
    (12, 32, 16, 256, ACT_LEAKY),
    (3, 32, 33, 120, ACT_NONE),     # ragged C, unaligned W, odd H
    (32, 32, 16, 960, ACT_RELU),    # v2 body class, W=960
    (8, 8, 8, 128, ACT_NONE),       # single row tile (n_h == 1)
])
def test_conv_s1_direct_matches_padded_path(cin, cout, h, w, act):
    """The direct stride-1 kernel must match both the XLA reference and the
    host-padded kernel."""
    import os

    x = jnp.asarray(RNG.standard_normal((2, cin, h, w), dtype=np.float32))
    k = jnp.asarray(
        RNG.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.2)
    b = jnp.asarray(RNG.standard_normal((cout,), dtype=np.float32))
    ref = conv_planar_ref(x, k, b, stride=1, act=act)
    xp = x.transpose(0, 2, 1, 3)
    with pltpu.force_tpu_interpret_mode():
        got = conv_planar(xp, k, b, stride=1, act=act).transpose(0, 2, 1, 3)
        os.environ["RIFE_TPU_S1_DIRECT"] = "0"
        try:
            padded = conv_planar(
                xp, k, b, stride=1, act=act).transpose(0, 2, 1, 3)
        finally:
            del os.environ["RIFE_TPU_S1_DIRECT"]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(padded, np.float32),
        atol=1e-5)


@pytest.mark.parametrize("parts_c,h,w,cout,act", [
    ((3, 3, 4), 16, 256, 48, ACT_LEAKY),   # v2 flownet block entry
    ((8, 4), 34, 960, 32, ACT_NONE),       # v4 block entry class
    ((3, 3, 1, 1, 4), 16, 120, 32, ACT_LEAKY),
    # v3.x full-res block entry (cout=80 > the plain-conv perf gate's 64;
    # enabled for the cat form to avoid materializing the full-res concat
    # XLA lane-pads 12.8-128x at small batch — round-5 v3.1 OOM fix)
    ((6, 4), 16, 256, 80, ACT_LEAKY),
])
def test_conv_planar_cat_matches_concat(parts_c, h, w, cout, act):
    """ConvolutionCat kernel: parts DMA into band channel slots — must
    equal conv(concat(parts)) exactly."""
    from rife_tpu.ops.conv_planar import conv_planar_cat

    parts = [jnp.asarray(RNG.standard_normal((2, c, h, w), dtype=np.float32))
             for c in parts_c]
    cin = sum(parts_c)
    k = jnp.asarray(
        RNG.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.2)
    b = jnp.asarray(RNG.standard_normal((cout,), dtype=np.float32))
    ref = conv_planar_ref(jnp.concatenate(parts, axis=1), k, b,
                          stride=2, act=act)
    with pltpu.force_tpu_interpret_mode():
        got = conv_planar_cat(
            [p.transpose(0, 2, 1, 3) for p in parts], k, b, act=act
        ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=1e-4)
