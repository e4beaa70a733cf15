"""Region-layout planning tests (graph/layout.py + RegionExecutor).

Runs on the CPU backend: without ``use_pallas_warp`` the conv/warp anchors
stay NHWC, but the narrow-big intrinsic rule and the consumer votes still
produce mixed plans (planar glue chains, NHWC convs), exercising the
conversion machinery end-to-end.  Output parity vs the flat NHWC executor
must be exact — layout is a pure representation change.
"""

import numpy as np
import pytest

from rife_tpu.graph import layout as L
from rife_tpu.graph.executor import Executor, RegionExecutor
from rife_tpu.graph.param import parse_param
from rife_tpu.graph.weights import load_bin
from rife_tpu.ops import jax_ops
from rife_tpu.ops.planar_ops import OP_TABLE_PLANAR

V23 = "/root/reference/models/rife-v2.3"
V46 = "/root/reference/models/rife-v4.6"


def _executors(base, ctx_extra=None):
    g = parse_param(base + ".param")
    w = load_bin(g, base + ".bin")
    ctx = {"w": jax_ops.prepare_weights(g, w)}
    if ctx_extra:
        ctx.update(ctx_extra)
    flat = Executor(g, jax_ops.OP_TABLE, w, ctx=ctx)
    region = RegionExecutor(g, jax_ops.OP_TABLE, OP_TABLE_PLANAR, w, ctx=ctx)
    return g, flat, region


def test_region_matches_flat_contextnet_real_weights():
    """Real shipped weights; narrow threshold dropped so planar regions
    engage at test-size shapes."""
    import jax.numpy as jnp

    g, flat, region = _executors(
        f"{V23}/contextnet", {"layout_narrow_min_hw": 64}
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 64, 96, 3), np.float32))
    flow = jnp.asarray(rng.random((2, 32, 48, 2), np.float32) * 4 - 2)
    outs_f = flat.run({"input.1": img, "flow.0": flow},
                      ["f1", "f2", "f3", "f4"])
    outs_r = region.run({"input.1": img, "flow.0": flow},
                        ["f1", "f2", "f3", "f4"])
    for a, b in zip(outs_f, outs_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_region_matches_flat_v46_flownet_synthetic():
    import jax.numpy as jnp

    from rife_tpu.models.zoo import load_model

    net = load_model("rife-v4.6").nets["flownet"]  # synthetic weights
    g, w = net.graph, net.weights
    ctx = {"w": jax_ops.prepare_weights(g, w), "layout_narrow_min_hw": 64}
    flat = Executor(g, jax_ops.OP_TABLE, w, ctx=ctx)
    region = RegionExecutor(g, jax_ops.OP_TABLE, OP_TABLE_PLANAR, w, ctx=ctx)
    rng = np.random.default_rng(1)
    i0 = jnp.asarray(rng.random((1, 64, 96, 3), np.float32))
    i1 = jnp.asarray(rng.random((1, 64, 96, 3), np.float32))
    t = jnp.full((1, 64, 96, 1), 0.5, jnp.float32)
    ins = {"in0": i0, "in1": i1, "in2": t}
    a = flat.run(ins, ["out0"])[0]
    b = region.run(ins, ["out0"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                               atol=1e-5)


def test_region_planar_outputs_are_planes():
    import jax.numpy as jnp

    g, flat, region = _executors(
        f"{V23}/contextnet", {"layout_narrow_min_hw": 64}
    )
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((2, 64, 96, 3), np.float32))
    flow = jnp.asarray(rng.random((2, 32, 48, 2), np.float32))
    (f1_nhwc,) = flat.run({"input.1": img, "flow.0": flow}, ["f1"])
    (f1_pl,) = region.run(
        {"input.1": img, "flow.0": flow}, ["f1"],
        {"planar_outputs": frozenset(("f1",))},
    )
    # planar outputs are BHCW (B, H, C, W)
    assert f1_pl.shape == (2, f1_nhwc.shape[1], f1_nhwc.shape[3],
                           f1_nhwc.shape[2])
    np.testing.assert_allclose(
        np.asarray(f1_pl.transpose(0, 1, 3, 2)), np.asarray(f1_nhwc),
        rtol=0, atol=1e-5,
    )


def test_plan_split_transparent_and_anchors():
    """Planner unit check on a tiny synthetic graph: a warp anchored NCHW
    pulls its flexible producers planar; a wide conv stays NHWC."""
    from rife_tpu.graph.ir import Graph, LayerNode

    nodes = [
        LayerNode("Input", "in0", [], ["img"]),
        LayerNode("Input", "inf", [], ["flow"]),
        LayerNode("Split", "sp", ["img"], ["img_a", "img_b"]),
        LayerNode("BinaryOp", "scale", ["flow"], ["flow2"],
                  {0: 2, 1: 1, 2: 2.0}),
        LayerNode("rife.Warp", "warp", ["img_a", "flow2"], ["warped"]),
        LayerNode("Concat", "cat", ["warped", "img_b"], ["catd"], {0: 0}),
    ]
    producer = {}
    for idx, n in enumerate(nodes):
        for slot, t in enumerate(n.tops):
            producer[t] = (idx, slot)
    g = Graph(nodes=nodes, producer=producer, input_blobs=["img", "flow"])
    shapes = {
        "img": (1, 800, 800, 3), "flow": (1, 800, 800, 2),
        "img_a": (1, 800, 800, 3), "img_b": (1, 800, 800, 3),
        "flow2": (1, 800, 800, 2), "warped": (1, 800, 800, 3),
        "catd": (1, 800, 800, 6),
    }
    ctx = {"use_pallas_warp": True, "u8_image_blobs": frozenset(("img_a",)),
           "layout_narrow_min_hw": 400_000}
    needed = g.required_nodes(["catd"], ["img", "flow"])
    plan = L.plan_layouts(g, needed, shapes, ctx, ["catd"])
    by_name = {nodes[i].name: lay for i, lay in plan.items()}
    assert by_name["warp"] == L.NCHW          # Pallas warp anchor
    assert by_name["cat"] == L.NCHW           # narrow-big materializing op
    assert by_name["scale"] == L.NCHW         # consumer vote (warp)
