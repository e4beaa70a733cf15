"""Per-op parity tests: JAX backend vs NumPy oracle vs torch (independent).

torch (CPU) ships in the image and gives a third, independent implementation
of conv / deconv / resize / pixel-shuffle — this pins down layout conventions
(e.g. ConvTranspose2d IOHW weights) that the two in-repo backends could
otherwise get wrong *together*.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from rife_tpu.graph.ir import LayerNode
from rife_tpu.ops import jax_ops, numpy_ref

RNG = np.random.default_rng(0)


def to_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def from_nchw(t):
    return t.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("stride,pad,dilation,k", [(1, 1, 1, 3), (2, 1, 1, 3), (1, 0, 1, 1), (2, 1, 1, 4)])
def test_conv2d_three_way(stride, pad, dilation, k):
    x = RNG.normal(size=(2, 12, 10, 5)).astype(np.float32)
    w = RNG.normal(size=(7, 5, k, k)).astype(np.float32) * 0.2
    b = RNG.normal(size=(7,)).astype(np.float32)
    ref = numpy_ref.conv2d(x, w, b, stride=stride, pad=pad, dilation=dilation)
    got = np.asarray(
        jax_ops.conv2d(
            jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b),
            stride=stride, pad=pad, dilation=dilation,
        )
    )
    tch = from_nchw(
        F.conv2d(to_nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                 stride=stride, padding=pad, dilation=dilation)
    )
    np.testing.assert_allclose(ref, tch, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,pad,k", [(2, 1, 4), (2, 1, 2), (1, 0, 3)])
def test_deconv2d_three_way(stride, pad, k):
    x = RNG.normal(size=(2, 6, 5, 4)).astype(np.float32)
    w = RNG.normal(size=(4, 6, k, k)).astype(np.float32) * 0.2  # (in, out, kh, kw)
    b = RNG.normal(size=(6,)).astype(np.float32)
    ref = numpy_ref.deconv2d(x, w, b, stride=stride, pad=pad)
    wj = jnp.asarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    got = np.asarray(
        jax_ops.deconv2d(jnp.asarray(x), wj, jnp.asarray(b), stride=stride, pad=pad)
    )
    tch = from_nchw(
        F.conv_transpose2d(to_nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                           stride=stride, padding=pad)
    )
    np.testing.assert_allclose(ref, tch, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scale", [0.125, 0.25, 0.5, 2.0, 4.0, 16.0])
def test_resize_bilinear_three_way(scale):
    h = w = 16
    x = RNG.normal(size=(2, h, w, 3)).astype(np.float32)
    oh, ow = int(h * scale), int(w * scale)
    ref = numpy_ref.resize_bilinear(x, oh, ow)
    got = np.asarray(jax_ops.resize2d(jnp.asarray(x), oh, ow))
    tch = from_nchw(
        F.interpolate(to_nchw(x), size=(oh, ow), mode="bilinear",
                      align_corners=False, antialias=False)
    )
    np.testing.assert_allclose(ref, tch, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pixel_shuffle_three_way():
    x = RNG.normal(size=(2, 4, 5, 24)).astype(np.float32)
    ref = numpy_ref.pixel_shuffle(x, 2)
    got = np.asarray(jax_ops.pixel_shuffle(jnp.asarray(x), 2))
    tch = from_nchw(F.pixel_shuffle(to_nchw(x), 2))
    np.testing.assert_allclose(ref, tch, atol=0)
    np.testing.assert_allclose(got, ref, atol=0)


def test_warp_matches_shader_oracle():
    x = RNG.normal(size=(2, 9, 11, 3)).astype(np.float32)
    flow = (RNG.normal(size=(2, 9, 11, 2)) * 3).astype(np.float32)
    ref = numpy_ref.warp(x, flow)
    got = np.asarray(jax_ops.warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_warp_at_batch_chunking_equivalent():
    """`warp_at` processes big batches in sequential lax.map chunks (the
    XLA-variant memory fix, BASELINE.md round-5); every op is
    per-batch-element, so the chunked path matches per-element execution
    up to XLA's per-program FMA re-association of the lerp chain (~1 ulp
    f32).  8 x (1024x1024) trips the b>=8 & >=1M-pixel gate."""
    b, h, w = 8, 1024, 1024
    x = RNG.normal(size=(b, h, w, 1)).astype(np.float32)
    sy = (RNG.normal(size=(b, h, w)) * 7 + h / 2).astype(np.float32)
    sx = (RNG.normal(size=(b, h, w)) * 7 + w / 2).astype(np.float32)
    xj, syj, sxj = jnp.asarray(x), jnp.asarray(sy), jnp.asarray(sx)
    chunked = np.asarray(jax_ops.warp_at(xj, syj, sxj))
    direct = np.concatenate([
        np.asarray(jax_ops.warp_at(xj[i : i + 1], syj[i : i + 1],
                                   sxj[i : i + 1]))
        for i in range(b)
    ])
    np.testing.assert_allclose(chunked, direct, rtol=0, atol=1e-6)


def test_warp_zero_flow_is_identity():
    x = RNG.normal(size=(1, 8, 8, 4)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    np.testing.assert_allclose(np.asarray(jax_ops.warp(jnp.asarray(x), jnp.asarray(flow))), x, atol=1e-6)


def test_warp_border_extrapolation_replicates_edges():
    """Samples far outside the frame must return the clamped-edge pixel
    (warp.comp clamps corners before the lerp)."""
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    flow = np.full((1, 4, 4, 2), -100.0, np.float32)
    got = np.asarray(jax_ops.warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got, np.full_like(got, x[0, 0, 0, 0]))
    ref = numpy_ref.warp(x, flow)
    np.testing.assert_allclose(got, ref)


def test_global_pooling_and_innerproduct_broadcast():
    node_pool = LayerNode("Pooling", "p", ["x"], ["y"], {0: 1, 4: 1})
    x = RNG.normal(size=(2, 6, 6, 8)).astype(np.float32)
    ref = numpy_ref.OP_TABLE["Pooling"](node_pool, [x], None, {})[0]
    got = np.asarray(jax_ops.OP_TABLE["Pooling"](node_pool, [jnp.asarray(x)], None, {})[0])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert got.shape == (2, 8)
    # (B,C) * (B,H,W,C) broadcast used by the v1 SE blocks
    node_mul = LayerNode("BinaryOp", "m", ["a", "b"], ["z"], {0: 2})
    refm = numpy_ref.OP_TABLE["BinaryOp"](node_mul, [x, ref], None, {})[0]
    gotm = np.asarray(
        jax_ops.OP_TABLE["BinaryOp"](node_mul, [jnp.asarray(x), jnp.asarray(ref)], None, {})[0]
    )
    np.testing.assert_allclose(gotm, refm, rtol=1e-5, atol=1e-6)


def test_eltwise_weighted_sum():
    node = LayerNode("Eltwise", "e", ["a", "b"], ["z"], {0: 1, -23301: [1.0, 4.0]})
    a = RNG.normal(size=(1, 4, 4, 2)).astype(np.float32)
    b = RNG.normal(size=(1, 4, 4, 2)).astype(np.float32)
    ref = numpy_ref.OP_TABLE["Eltwise"](node, [a, b], None, {})[0]
    got = np.asarray(jax_ops.OP_TABLE["Eltwise"](node, [jnp.asarray(a), jnp.asarray(b)], None, {})[0])
    np.testing.assert_allclose(ref, a + 4 * b, rtol=1e-5)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_crop_channel_slice():
    # fusionnet slices flow channels [0,2) and [2,4) this way
    node = LayerNode("Crop", "c", ["x"], ["y"], {-23309: [2], -23310: [4], -23311: [0]})
    x = RNG.normal(size=(1, 4, 4, 5)).astype(np.float32)
    ref = numpy_ref.OP_TABLE["Crop"](node, [x], None, {})[0]
    got = np.asarray(jax_ops.OP_TABLE["Crop"](node, [jnp.asarray(x)], None, {})[0])
    np.testing.assert_array_equal(ref, x[..., 2:4])
    np.testing.assert_array_equal(got, ref)


def test_slice_auto_split():
    node = LayerNode("Slice", "s", ["x"], ["a", "b"], {-23300: [-233, -233], 1: 0})
    x = RNG.normal(size=(1, 4, 4, 6)).astype(np.float32)
    ref = numpy_ref.OP_TABLE["Slice"](node, [x], None, {})
    got = jax_ops.OP_TABLE["Slice"](node, [jnp.asarray(x)], None, {})
    assert ref[0].shape == (1, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(got[0]), ref[0])
    np.testing.assert_array_equal(np.asarray(got[1]), ref[1])


def test_conv2d_s2d_exact():
    """Space-to-depth 3x3 conv (round-2 narrow-channel lever) must equal the
    direct conv bit-for-bit structure-wise (f32, same contraction order up
    to float assoc -> tight tolerance)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(7,)), jnp.float32)
    ref = jax_ops.conv2d(x, w, b, stride=1, pad=1)
    got = jax_ops.conv2d_s2d(x, jax_ops.s2d_conv_kernel(w), b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_roundtrip():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 8, 12, 3)), jnp.float32)
    y = jax_ops.depth_to_space(jax_ops.space_to_depth(x))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
