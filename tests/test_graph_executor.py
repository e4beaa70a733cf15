"""Full-graph parity: JAX executor vs NumPy oracle on real model graphs.

Covers: the v2.3 contextnet (real fp16 weights from the mount), the v4.6
flownet (synthetic weights, all 215 layers including PixelShuffle/Eltwise/
Sigmoid), the v1 flownet prefix (SE-attention blocks with global pooling +
InnerProduct), and ncnn-Extractor-style pinning of intermediate blobs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from rife_tpu.graph.executor import Executor
from rife_tpu.graph.param import parse_param
from rife_tpu.graph.weights import load_bin, synthesize_weights
from rife_tpu.ops import jax_ops, numpy_ref

RNG = np.random.default_rng(42)


def run_both(graph, weights, inputs_np, outputs):
    np_exec = Executor(graph, numpy_ref.OP_TABLE, weights)
    ref = np_exec.run(inputs_np, outputs)
    prepared = jax_ops.prepare_weights(graph, weights)
    jx_exec = Executor(graph, jax_ops.OP_TABLE, weights, ctx={"w": prepared})
    inputs_j = {k: jnp.asarray(v) for k, v in inputs_np.items()}
    got = [np.asarray(v) for v in jx_exec.run(inputs_j, outputs)]
    return ref, got


def test_v23_contextnet_real_weights_parity():
    base = "/root/reference/models/rife-v2.3/contextnet"
    g = parse_param(base + ".param")
    w = load_bin(g, base + ".bin")
    # NB: the v2 flownet emits "flow" at HALF resolution (the fusionnet head
    # upsamples it x2, models/rife-v2.3/fusionnet.param:13-14), so the
    # contextnet's flow.0 input is half-res relative to input.1.
    inputs = {
        "input.1": RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
        "flow.0": (RNG.normal(size=(1, 16, 16, 2)) * 2).astype(np.float32),
    }
    ref, got = run_both(g, w, inputs, ["f1", "f2", "f3", "f4"])
    assert [r.shape for r in ref] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128), (1, 1, 1, 256)
    ]
    for r, o in zip(ref, got):
        np.testing.assert_allclose(o, r, rtol=2e-3, atol=2e-4)


def test_v46_flownet_synthetic_parity_and_pinning():
    g = parse_param("/root/reference/models/rife-v4.6/flownet.param")
    # the CALIBRATED zoo tag: uncalibrated synthetic weights produce huge
    # flows that border-clamp everywhere at 32x32, making out0 insensitive
    # to pinned-flow perturbations (flow3 is only the level-3 increment;
    # the blend adds it to the level-2 accumulated flow, graph add_73)
    w = synthesize_weights(g, "rife-v4.6/flownet")
    inputs = {
        "in0": RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
        "in1": RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
        "in2": np.full((1, 32, 32, 1), 0.5, np.float32),
    }
    outs = ["flow0", "flow1", "flow2", "flow3", "out0"]
    ref, got = run_both(g, w, inputs, outs)
    # v4.6 taps are 6-channel (24ch deconv -> PixelShuffle /4): 4 flow +
    # 1 mask + 1 extra feature channel (v4.0 taps are 5-channel).
    assert ref[0].shape == (1, 4, 4, 6)   # 1/8 scale
    assert ref[-1].shape == (1, 32, 32, 3)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(o, r, rtol=2e-3, atol=2e-4)
    # out0 comes from a sigmoid-mask blend of two warped [0,1] images -> bounded
    assert ref[-1].min() > -1.0 and ref[-1].max() < 2.0

    # pin flow0..flow3 (v4 TTA re-injection path) and recompute out0:
    # with the *same* values pinned the result must match the direct run
    np_exec = Executor(g, numpy_ref.OP_TABLE, w)
    pinned_inputs = dict(inputs)
    for name, val in zip(outs[:4], ref[:4]):
        pinned_inputs[name] = val
    out_pinned = np_exec.run(pinned_inputs, ["out0"])[0]
    np.testing.assert_allclose(out_pinned, ref[-1], rtol=1e-5, atol=1e-6)
    # with *different* flows pinned the result must change.  NB: pin values
    # that stay IN RANGE — the uncalibrated test weights produce huge smooth
    # flows that clamp to the borders everywhere, where any perturbation of
    # an already-clamped flow is a no-op by design
    zeroed = dict(pinned_inputs)
    zeroed["flow3"] = np.zeros_like(ref[3])
    out_zero = np_exec.run(zeroed, ["out0"])[0]
    shifted = dict(pinned_inputs)
    sh = np.zeros_like(ref[3])
    sh[..., :4] = 1.5  # +1.5 px displacement, in range at 32x32
    shifted["flow3"] = sh
    out_shift = np_exec.run(shifted, ["out0"])[0]
    assert np.abs(out_shift - out_zero).max() > 1e-3


def test_v1_flownet_se_blocks_parity():
    g = parse_param("/root/reference/models/rife/flownet.param")
    w = synthesize_weights(g, "test-v1")
    inputs = {
        "input0": RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
        "input1": RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
    }
    ref, got = run_both(g, w, inputs, ["flow"])
    assert ref[0].shape[-1] == 2  # v1 flow is 2-channel
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-3, atol=2e-4)


def test_jit_compiles_whole_graph():
    """The executor must trace cleanly under jit: one XLA program per net."""
    base = "/root/reference/models/rife-v2.3/contextnet"
    g = parse_param(base + ".param")
    w = load_bin(g, base + ".bin")
    prepared = jax_ops.prepare_weights(g, w)
    exec_ = Executor(g, jax_ops.OP_TABLE, w, ctx={"w": prepared})

    @jax.jit
    def f(img, flow):
        return exec_.run({"input.1": img, "flow.0": flow}, ["f1", "f2", "f3", "f4"])

    img = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    flow = jnp.zeros((1, 16, 16, 2), jnp.float32)
    outs = f(img, flow)
    assert outs[0].shape == (1, 8, 8, 32)
    outs2 = f(img, flow)  # cached call
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs2[0]))
