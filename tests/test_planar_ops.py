"""Planar (BHCW) op table parity vs the NHWC table on real graphs.

The planar mode is the TPU narrow-channel execution path (see
ops/planar_ops.py); on CPU sessions it is disabled, so parity here is
pinned explicitly: the same graph run through ``PlanarExecutor`` +
``OP_TABLE_PLANAR`` (Pallas convs in interpret mode, ``planar_all`` so
the narrow-conv path fires at test sizes) must match the standard NHWC
``Executor`` bit-for-bit at f32 tolerances.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from rife_tpu.graph.executor import Executor, PlanarExecutor
from rife_tpu.graph.param import parse_param
from rife_tpu.graph.weights import load_bin
from rife_tpu.ops import jax_ops
from rife_tpu.ops.planar_ops import OP_TABLE_PLANAR

BASE = "/root/reference/models/rife-v2.3/contextnet"
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def ctxnet():
    g = parse_param(BASE + ".param")
    w = load_bin(g, BASE + ".bin")
    prepared = jax_ops.prepare_weights(g, w)
    return g, w, prepared


def test_contextnet_planar_matches_nhwc(ctxnet):
    g, w, prepared = ctxnet
    img = jnp.asarray(RNG.uniform(0, 1, (1, 32, 64, 3)), jnp.float32)
    flow = jnp.asarray(
        RNG.normal(size=(1, 16, 32, 2)) * 2, jnp.float32)
    outs = ["f1", "f2", "f3", "f4"]
    ref_ex = Executor(g, jax_ops.OP_TABLE, w, ctx={"w": prepared})
    ref = ref_ex.run({"input.1": img, "flow.0": flow}, outs)
    pl_ex = PlanarExecutor(
        g, OP_TABLE_PLANAR, w,
        ctx={"w": prepared, "use_pallas_warp": True, "planar_all": True},
    )
    with pltpu.force_tpu_interpret_mode():
        got = pl_ex.run({"input.1": img, "flow.0": flow}, outs)
    for name, r, p in zip(outs, ref, got):
        assert p.shape == r.shape, name
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), atol=5e-5, err_msg=name)


def test_deconv_planar_matches_deconv2d():
    from rife_tpu.ops.conv_planar import deconv_planar

    ci, co, h, w = 6, 4, 8, 128
    x = jnp.asarray(RNG.standard_normal((2, ci, h, w), dtype=np.float32))
    wf = jnp.asarray(
        RNG.standard_normal((4, 4, ci, co), dtype=np.float32) * 0.2)
    bias = jnp.asarray(RNG.standard_normal((co,), dtype=np.float32))
    ref = jax_ops.deconv2d(
        x.transpose(0, 2, 3, 1), wf, bias, stride=2, pad=1
    ).transpose(0, 3, 1, 2)
    with pltpu.force_tpu_interpret_mode():
        got = deconv_planar(
            x.transpose(0, 2, 1, 3), wf, bias
        ).transpose(0, 2, 1, 3)
    assert got.shape == ref.shape == (2, co, 2 * h, 2 * w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5)


def test_resize2d_bhcw_matches_nhwc():
    from rife_tpu.ops.planar_ops import resize2d_bhcw

    x = jnp.asarray(RNG.uniform(0, 1, (2, 12, 5, 20)), jnp.float32)  # BHCW
    for oh, ow in ((24, 40), (6, 10), (48, 80)):
        ref = jax_ops.resize2d(
            x.transpose(0, 1, 3, 2), oh, ow).transpose(0, 1, 3, 2)
        got = resize2d_bhcw(x, oh, ow)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pixelshuffle_planar_matches_nhwc():
    from rife_tpu.ops.planar_ops import _op_pixelshuffle

    class N:
        def p(self, k, d=None):
            return 2

    x = jnp.asarray(RNG.uniform(0, 1, (1, 6, 12, 8)), jnp.float32)  # BHCW
    ref = jax_ops.pixel_shuffle(
        x.transpose(0, 1, 3, 2), 2).transpose(0, 1, 3, 2)
    got = _op_pixelshuffle(N(), [x], None, {})[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_deconv_ps_planar_matches_compose():
    """deconv_ps_planar == pixel_shuffle(deconv2d(...), 2) exactly — the
    fusion only reorders output-channel writes (graph/rewrite.py
    fuse_pixelshuffle_into_convs)."""
    from rife_tpu.ops.conv_planar import deconv_ps_planar

    ci, co, h, w = 6, 8, 8, 128  # c = co//4 = 2
    x = jnp.asarray(RNG.standard_normal((2, h, ci, w), dtype=np.float32))
    wf = jnp.asarray(
        RNG.standard_normal((4, 4, ci, co), dtype=np.float32) * 0.2)
    bias = jnp.asarray(RNG.standard_normal((co,), dtype=np.float32))
    ref = jax_ops.pixel_shuffle(
        jax_ops.deconv2d(x.transpose(0, 1, 3, 2), wf, bias, stride=2, pad=1),
        2,
    ).transpose(0, 1, 3, 2)  # -> BHCW
    with pltpu.force_tpu_interpret_mode():
        got = deconv_ps_planar(x, wf, bias)
    assert got.shape == ref.shape == (2, 4 * h, co // 4, 4 * w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_deconv_ps_planar_prelu_slope_permutes():
    """Fused per-channel PReLU: the slope vector must ride the same
    output-channel permutation as the weights."""
    from rife_tpu.ops.conv_planar import ACT_PRELU, deconv_ps_planar

    ci, co, h, w = 4, 8, 8, 128
    x = jnp.asarray(RNG.standard_normal((1, h, ci, w), dtype=np.float32))
    wf = jnp.asarray(
        RNG.standard_normal((4, 4, ci, co), dtype=np.float32) * 0.3)
    slope = jnp.asarray(RNG.uniform(0.05, 0.5, (co,)).astype(np.float32))
    y = jax_ops.deconv2d(x.transpose(0, 1, 3, 2), wf, None, stride=2, pad=1)
    y = jnp.where(y >= 0, y, y * slope.reshape(1, 1, 1, co))
    ref = jax_ops.pixel_shuffle(y, 2).transpose(0, 1, 3, 2)
    with pltpu.force_tpu_interpret_mode():
        got = deconv_ps_planar(x, wf, None, act=ACT_PRELU, slope=slope)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_conv_ps_planar_matches_compose():
    from rife_tpu.ops.conv_planar import conv_ps_planar

    ci, co, h, w = 4, 8, 8, 128  # c = co//4 = 2
    x = jnp.asarray(RNG.standard_normal((2, h, ci, w), dtype=np.float32))
    hw = jnp.asarray(
        RNG.standard_normal((3, 3, ci, co), dtype=np.float32) * 0.2)
    bias = jnp.asarray(RNG.standard_normal((co,), dtype=np.float32))
    ref = jax_ops.pixel_shuffle(
        jax_ops.conv2d(x.transpose(0, 1, 3, 2), hw, bias, stride=1, pad=1),
        2,
    ).transpose(0, 1, 3, 2)
    with pltpu.force_tpu_interpret_mode():
        got = conv_ps_planar(x, hw, bias, r=2)
    assert got.shape == ref.shape == (2, 2 * h, co // 4, 2 * w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
