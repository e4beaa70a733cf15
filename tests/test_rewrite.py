"""Exactness of the Interp(1/4) ∘ rife.Warp graph fusion (graph/rewrite.py).

The v4-family flownet warps the FULL-RES frames at pyramid block 1 and
immediately quarter-downscales them (reference graph:
/root/reference/models/rife-v4.6/flownet.param warp_0/warp_1 -> cat_3 ->
upsample_12).  The rewrite must (a) fire exactly on that pattern and
(b) leave the executed numbers bit-identical on the XLA path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rife_tpu.graph.executor import Executor
from rife_tpu.graph.ir import LayerNode
from rife_tpu.graph.param import parse_param
from rife_tpu.graph.rewrite import fuse_quarter_downscaled_warps
from rife_tpu.graph.weights import synthesize_weights
from rife_tpu.ops import jax_ops

RNG = np.random.default_rng(11)

V46 = "/root/reference/models/rife-v4.6/flownet.param"


def test_rewrite_fires_on_v46_flownet():
    g = parse_param(V46)
    g2 = fuse_quarter_downscaled_warps(g)
    hist = g2.type_histogram()
    # exactly block 1's two full-res warps are quarter-downscaled
    assert hist.get("rife.WarpDs4", 0) == 2
    # the input graph object is untouched
    assert "rife.WarpDs4" not in g.type_histogram()
    # weighted layers are untouched (same conv/deconv nodes by name)
    for t in ("Convolution", "Deconvolution"):
        assert sorted(n.name for n in g2.layers_of_type(t)) == sorted(
            n.name for n in g.layers_of_type(t)
        )
    # only blobs made dead by the rewrite (the fused Concat tops, which had
    # exactly one consumer) may lose their producer; no live node consumes
    # them and the pyramid taps all survive
    missing = set(g.producer) - set(g2.producer)
    live_bottoms = {b for n in g2.nodes for b in n.bottoms}
    assert not (missing & live_bottoms)
    for tap in ("flow0", "flow1", "flow2", "flow3", "out0"):
        assert tap in g2.producer


def test_rewrite_noop_without_pattern():
    g = parse_param("/root/reference/models/rife-v2.3/contextnet.param")
    assert fuse_quarter_downscaled_warps(g) is g


def test_warp_ds4_op_bit_exact_vs_unfused():
    img = RNG.uniform(0, 1, (2, 32, 64, 3)).astype(np.float32)
    flow = (RNG.normal(size=(2, 8, 16, 2)) * 5).astype(np.float32)
    # full-res flow, smooth-ish: upsample a coarse field
    flow = np.asarray(
        jax_ops.resize2d(jnp.asarray(flow), 32, 64), np.float32
    )
    node = LayerNode("rife.WarpDs4", "t", ["a", "b"], ["o"], {})
    fused = jax_ops._op_warp_ds4(
        node, [jnp.asarray(img), jnp.asarray(flow)], None, {}
    )[0]
    ref = jax_ops.resize2d(
        jax_ops.warp(jnp.asarray(img), jnp.asarray(flow)), 8, 16
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_v46_flownet_rewrite_bit_exact_end_to_end():
    g = parse_param(V46)
    w = synthesize_weights(g, "rife-v4.6/flownet")
    g2 = fuse_quarter_downscaled_warps(g)
    inputs = {
        "in0": jnp.asarray(RNG.uniform(0, 1, (1, 64, 64, 3)), jnp.float32),
        "in1": jnp.asarray(RNG.uniform(0, 1, (1, 64, 64, 3)), jnp.float32),
        "in2": jnp.full((1, 64, 64, 1), 0.5, jnp.float32),
    }
    outs = ["flow0", "flow1", "flow2", "flow3", "out0"]

    def run(graph):
        prepared = jax_ops.prepare_weights(graph, w)
        ex = Executor(graph, jax_ops.OP_TABLE, w, ctx={"w": prepared})
        return [np.asarray(v) for v in ex.run(inputs, outs)]

    ref, got = run(g), run(g2)
    for name, r, o in zip(outs, ref, got):
        np.testing.assert_array_equal(o, r, err_msg=name)


def test_rewrite_distributes_half_downscale():
    """R1 also distributes block2's Interp(1/2) across its concat
    (rife-v4.6 flownet upsample_15, cat_7 at param lines 113-114): the
    full-res 8ch concat must no longer exist.  With ``fuse_half`` (the
    default) the two warp parts then fuse into rife.WarpDs2 nodes; the
    timestep/mask parts stay as Interp __part nodes."""
    g = parse_param(V46)
    g2 = fuse_quarter_downscaled_warps(g)
    names = {n.name for n in g2.nodes}
    # the v4.6 block2 downscale node is replaced by per-input parts + cat
    assert "upsample_15" not in names
    parts = [n for n in g2.nodes if n.name.startswith("upsample_15__part")]
    assert len(parts) == 4
    # timestep/mask parts stay Interp; the warp parts became WarpDs2
    assert sorted(n.type for n in parts) == [
        "Interp", "Interp", "rife.WarpDs2", "rife.WarpDs2"
    ]
    assert any(n.name == "upsample_15__cat" for n in g2.nodes)
    # the original full-res concat (cat_7) is gone
    assert "cat_7" not in names
    assert g2.type_histogram().get("rife.WarpDs2", 0) == 2
    # opting out of the half fusion restores warp + per-part Interp
    g3 = fuse_quarter_downscaled_warps(g, fuse_half=False)
    assert "rife.WarpDs2" not in g3.type_histogram()
    parts3 = [n for n in g3.nodes if n.name.startswith("upsample_15__part")]
    assert all(n.type == "Interp" for n in parts3)


def test_warp_ds2_op_bit_exact_vs_unfused():
    """The WarpDs2 op's XLA fallback is the literal unfused composition;
    this pins the half-res output size and exactness."""
    img = RNG.uniform(0, 1, (2, 32, 64, 3)).astype(np.float32)
    flow = (RNG.normal(size=(2, 8, 16, 2)) * 5).astype(np.float32)
    flow = np.asarray(
        jax_ops.resize2d(jnp.asarray(flow), 32, 64), np.float32
    )
    node = LayerNode("rife.WarpDs2", "t", ["a", "b"], ["o"], {})
    fused = jax_ops._op_warp_ds2(
        node, [jnp.asarray(img), jnp.asarray(flow)], None, {}
    )[0]
    ref = jax_ops.resize2d(
        jax_ops.warp(jnp.asarray(img), jnp.asarray(flow)), 16, 32
    )
    assert fused.shape == (2, 16, 32, 3)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_fuse_prelu_activations_v23():
    """All 56 of rife-v2.3's PReLU nodes fold into their convs; outputs of
    the fused graph match the unfused one exactly on CPU (f32)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rife_tpu.graph.executor import Executor
    from rife_tpu.graph.rewrite import fuse_prelu_activations
    from rife_tpu.models.zoo import load_model
    from rife_tpu.ops import jax_ops

    net = load_model("rife-v2.3").nets["contextnet"]
    g0, w0 = net.graph, net.weights
    g1, w1 = fuse_prelu_activations(g0, w0)
    assert not g1.layers_of_type("PReLU")
    assert len(g1.nodes) == len(g0.nodes) - len(g0.layers_of_type("PReLU"))
    fused_convs = [n for n in g1.nodes
                   if n.type in ("Convolution", "Deconvolution")
                   and int(n.p(9, 0)) == 100]
    assert len(fused_convs) == 10
    for n in fused_convs:
        assert w1[n.name].slope is not None

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, 32, 48, 2)), jnp.float32)
    outs = []
    for g, w in ((g0, w0), (g1, w1)):
        ex = Executor(g, jax_ops.OP_TABLE, w,
                      ctx={"w": jax_ops.prepare_weights(g, w)})
        outs.append(ex.run({"input.1": img, "flow.0": flow},
                           ["f1", "f2", "f3", "f4"], {}))
    for a, b in zip(*outs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fuse_concat_into_convs_v46():
    """The v4.6 block-entry concats become ConvolutionCat nodes; the NHWC
    table output is identical (it re-materializes the concat)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rife_tpu.graph.executor import Executor
    from rife_tpu.graph.rewrite import fuse_concat_into_convs
    from rife_tpu.models.zoo import load_model
    from rife_tpu.ops import jax_ops

    net = load_model("rife-v4.6").nets["flownet"]
    g0, w0 = net.graph, net.weights
    g1 = fuse_concat_into_convs(g0)
    cats = [n for n in g1.nodes if n.type == "ConvolutionCat"]
    assert len(cats) == 3  # cat_4/cat_8/cat_12 block entries
    assert len(g1.nodes) == len(g0.nodes) - 3  # each eats its Concat

    rng = np.random.default_rng(9)
    i0 = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    i1 = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    t = jnp.full((1, 64, 96, 1), 0.5, jnp.float32)
    outs = []
    for g in (g0, g1):
        ex = Executor(g, jax_ops.OP_TABLE, w0,
                      ctx={"w": jax_ops.prepare_weights(g, w0)})
        outs.append(ex.run({"in0": i0, "in1": i1, "in2": t}, ["out0"], {})[0])
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_fuse_pixelshuffle_fires_and_is_exact_v46():
    """Deconvolution(4x4 s2) -> PixelShuffle(2) block tails fuse into
    rife.DeconvPS; executed numbers are identical on the NHWC path (the
    fused node literally composes the two ops there)."""
    from rife_tpu.graph.executor import Executor
    from rife_tpu.graph.rewrite import fuse_pixelshuffle_into_convs
    from rife_tpu.models.zoo import load_model

    net = load_model("rife-v4.6").nets["flownet"]
    g, w = net.graph, net.weights
    g2 = fuse_pixelshuffle_into_convs(g)
    hist = g2.type_histogram()
    assert hist.get("rife.DeconvPS", 0) == 4
    assert hist.get("PixelShuffle", 0) == 0
    assert hist.get("Deconvolution", 0) == 0
    for tap in ("flow0", "flow1", "flow2", "flow3", "out0"):
        assert tap in g2.producer

    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    ins = {
        "in0": jnp.asarray(rng.random((1, 64, 96, 3), np.float32)),
        "in1": jnp.asarray(rng.random((1, 64, 96, 3), np.float32)),
        "in2": jnp.full((1, 64, 96, 1), 0.5, jnp.float32),
    }
    outs = ["flow3", "out0"]
    ref_ex = Executor(g, jax_ops.OP_TABLE, w,
                      ctx={"w": jax_ops.prepare_weights(g, w)})
    fus_ex = Executor(g2, jax_ops.OP_TABLE, w,
                      ctx={"w": jax_ops.prepare_weights(g2, w)})
    for a, b in zip(ref_ex.run(ins, outs), fus_ex.run(ins, outs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fuse_pixelshuffle_fires_on_v1_convs():
    """The v1-family Convolution(3x3) -> PixelShuffle(2) tails fuse into
    rife.ConvPS (/root/reference/models/rife/flownet.param:77-78)."""
    from rife_tpu.graph.rewrite import fuse_pixelshuffle_into_convs

    g = parse_param("/root/reference/models/rife/flownet.param")
    n_ps = g.type_histogram().get("PixelShuffle", 0)
    assert n_ps > 0
    g2 = fuse_pixelshuffle_into_convs(g)
    hist = g2.type_histogram()
    assert hist.get("rife.ConvPS", 0) == n_ps
    assert hist.get("PixelShuffle", 0) == 0


def test_fuse_pixelshuffle_planar_matches_nhwc_v46():
    """The planar table's permuted-weight DeconvPS matches the NHWC compose
    bit-for-bit through the real v4.6 flownet graph."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from rife_tpu.graph.executor import Executor, PlanarExecutor
    from rife_tpu.graph.rewrite import fuse_pixelshuffle_into_convs
    from rife_tpu.models.zoo import load_model
    from rife_tpu.ops.planar_ops import OP_TABLE_PLANAR

    net = load_model("rife-v4.6").nets["flownet"]
    g2 = fuse_pixelshuffle_into_convs(net.graph)
    w = net.weights
    prepared = jax_ops.prepare_weights(g2, w)
    rng = np.random.default_rng(7)
    ins = {
        "in0": jnp.asarray(rng.random((1, 32, 64, 3), np.float32)),
        "in1": jnp.asarray(rng.random((1, 32, 64, 3), np.float32)),
        "in2": jnp.full((1, 32, 64, 1), 0.5, jnp.float32),
    }
    outs = ["flow3", "out0"]
    ref = Executor(g2, jax_ops.OP_TABLE, w, ctx={"w": prepared}).run(
        ins, outs)
    pl = PlanarExecutor(
        g2, OP_TABLE_PLANAR, w,
        ctx={"w": prepared, "use_pallas_warp": True, "planar_all": True},
    )
    with pltpu.force_tpu_interpret_mode():
        got = pl.run(ins, outs)
    for name, a, b in zip(outs, ref, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, err_msg=name)


def test_fuse_render_blend_fires_and_is_exact_v46():
    """fuse_render_blend: fires once on the v4 render tail and the fused
    node's output is bit-identical to the composed warp/mul/add chain
    (reference tail: models/rife-v4.6/flownet.param sigmoid_8..add_78)."""
    from rife_tpu.graph.rewrite import fuse_render_blend
    from rife_tpu.graph.weights import synthesize_weights

    g = parse_param(V46)
    g2 = fuse_render_blend(g)
    hist = g2.type_histogram()
    assert hist.get("rife.RenderBlend", 0) == 1
    assert "rife.RenderBlend" not in g.type_histogram()
    rb = g2.layers_of_type("rife.RenderBlend")[0]
    assert rb.tops == ["out0"]
    assert len(rb.bottoms) == 5
    # the mask-direct warp comes first: its image is an in0 copy (blob 2)
    assert rb.bottoms[0] == "2" and rb.bottoms[2] == "8"

    w = synthesize_weights(g, "rife-v4.6/flownet")
    inputs = {
        "in0": jnp.asarray(RNG.uniform(0, 1, (1, 64, 64, 3)), jnp.float32),
        "in1": jnp.asarray(RNG.uniform(0, 1, (1, 64, 64, 3)), jnp.float32),
        "in2": jnp.full((1, 64, 64, 1), 0.5, jnp.float32),
    }

    def run(graph, ctx_extra=None):
        prepared = jax_ops.prepare_weights(graph, w)
        ctx = {"w": prepared, **(ctx_extra or {})}
        ex = Executor(graph, jax_ops.OP_TABLE, w, ctx=ctx)
        return np.asarray(ex.run(inputs, ["out0"])[0])

    ref = run(g)
    np.testing.assert_array_equal(run(g2), ref)
    # planar_outputs contract: plane-form result, same numbers
    got_planar = run(g2, {"planar_outputs": frozenset(("out0",))})
    np.testing.assert_array_equal(got_planar.transpose(0, 1, 3, 2), ref)


def test_fuse_render_blend_guards():
    """No fire when an intermediate is protected or multi-consumer."""
    from rife_tpu.graph.rewrite import fuse_render_blend

    g = parse_param(V46)
    # protecting one of the mul outputs blocks the fusion
    muls = [n for n in g.nodes if n.type == "BinaryOp"
            and int(n.p(0, 0)) == 2 and len(n.bottoms) == 2]
    blocked = fuse_render_blend(g, frozenset((muls[-1].tops[0],)))
    assert "rife.RenderBlend" not in blocked.type_histogram()
    # a graph without the pattern is returned unchanged (same object)
    g23 = parse_param("/root/reference/models/rife-v2.3/contextnet.param")
    assert fuse_render_blend(g23) is g23


def test_fuse_warps_into_cat_conv_fast_path_matches_composed():
    """rife.WarpCatConv: the planar fast path (Pallas warps -> direct-s2
    band slots) matches the composed warp+concat+conv within planar conv
    tolerance; the fallback path is exact."""
    import os

    from jax.experimental.pallas import tpu as pltpu

    from rife_tpu.graph.ir import LayerNode as LN

    b, h, wd = 1, 16, 256
    rng = np.random.default_rng(9)
    img0 = jnp.asarray(rng.integers(0, 256, (b, h, wd, 3)) / 255.0,
                       jnp.float32)
    img1 = jnp.asarray(rng.integers(0, 256, (b, h, wd, 3)) / 255.0,
                       jnp.float32)
    fl0 = jnp.asarray(rng.normal(size=(b, h, wd, 2)) * 3, jnp.float32)
    fl1 = jnp.asarray(rng.normal(size=(b, h, wd, 2)) * 3, jnp.float32)
    t = jnp.full((b, h, wd, 1), 0.5, jnp.float32)
    flow = jnp.asarray(rng.normal(size=(b, h, wd, 4)), jnp.float32)

    cin, cout = 11, 16  # 3+3+1+4 part channels
    hwio = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.01, jnp.float32)
    node = LN("rife.WarpCatConv", "t",
              ["i0", "f0", "i1", "f1", "tp", "fl"], ["o"],
              {0: cout, 1: 3, 3: 2, 4: 1, 5: 1, 9: 2,
               -23310: [1, 0.2], 26: [1, 1, 0, 0]})
    ctx = {
        "w": {"t": {"hwio": hwio, "bias": bias}},
        "use_pallas_warp": True,
        "planar_all": True,  # lift the min-resolution gate for test shapes
        "u8_image_blobs": frozenset(("i0", "i1")),
    }
    inputs = [img0, fl0, img1, fl1, t, flow]
    with pltpu.force_tpu_interpret_mode():
        fast = np.asarray(jax_ops._op_warp_cat_conv(node, inputs, None,
                                                    ctx)[0])
    os.environ["RIFE_TPU_FUSE_WARPCAT"] = "0"
    try:
        ref = np.asarray(jax_ops._op_warp_cat_conv(node, inputs, None,
                                                   {**ctx,
                                                    "use_pallas_warp": False}
                                                   )[0])
    finally:
        os.environ.pop("RIFE_TPU_FUSE_WARPCAT", None)
    assert fast.shape == ref.shape == (b, h // 2, wd // 2, cout)
    np.testing.assert_allclose(fast, ref, atol=5e-5, rtol=1e-4)


class TestPushConcatThroughInterp:
    """push_concat_through_interp: the v3.x block-entry pattern
    Interp(scale<1, Concat(parts)) splits into per-part downscales so the
    full-res concat (whose channel axis XLA lane-pads 12.8-128x at small
    batch — the round-5 v3.1 OOM) never materializes."""

    PROT = frozenset(("flow", "flow0", "flow1", "flow2", "flow3", "out0",
                      "f1", "f2", "f3", "f4", "output"))

    def _no_cat_feeds_downscale(self, g):
        producer = {}
        for i, n in enumerate(g.nodes):
            for t in n.tops:
                producer[t] = n
        for n in g.nodes:
            if n.type != "Interp":
                continue
            if not (0 < float(n.p(1, 0)) < 1 and 0 < float(n.p(2, 0)) < 1
                    and float(n.p(3, 0)) == 0 and float(n.p(4, 0)) == 0):
                continue
            p = producer.get(n.bottoms[0])
            if p is not None and p.type == "Concat" and int(p.p(0, 0)) == 0:
                return False
        return True

    def test_v31_flownet_structure(self):
        from rife_tpu.graph.param import parse_param
        from rife_tpu.graph.rewrite import push_concat_through_interp

        g = parse_param("/root/reference/models/rife-v3.1/flownet.param")
        assert not self._no_cat_feeds_downscale(g)  # pattern present raw
        g2 = push_concat_through_interp(g, self.PROT)
        assert self._no_cat_feeds_downscale(g2)
        # every blob consumed still has a producer or is an input
        produced = {t for n in g2.nodes for t in n.tops} | set(g2.input_blobs)
        produced0 = ({t for n in g.nodes for t in n.tops}
                     | set(g.input_blobs))
        for n in g2.nodes:
            for b in n.bottoms:
                assert b in produced or b not in produced0

    def test_upsamples_left_fused(self):
        """Upsample(concat) sites (v4.6 flow upsamples) must NOT split —
        splitting measured a 1-LSB FMA-contraction drift."""
        from rife_tpu.graph.param import parse_param
        from rife_tpu.graph.rewrite import push_concat_through_interp

        g = parse_param("/root/reference/models/rife-v4.6/flownet.param")
        g2 = push_concat_through_interp(g, self.PROT)
        split = [n for n in g2.nodes if "__part" in n.name
                 and not (0 < float(n.p(1, 0)) < 1)]
        assert split == []

    @pytest.mark.parametrize("model", ["rife-v3.1", "rife-v2.3"])
    def test_forward_equivalence(self, model, monkeypatch):
        from rife_tpu.engine.session import RIFE

        rng = np.random.default_rng(11)
        f0 = rng.integers(0, 256, (1, 64, 96, 3), np.uint8)
        f1 = rng.integers(0, 256, (1, 64, 96, 3), np.uint8)
        ts = np.array([0.5], np.float32)
        monkeypatch.setenv("RIFE_TPU_CAT_INTERP", "1")
        a = RIFE(model, dtype="float32").process_batch(f0, f1, ts)
        monkeypatch.setenv("RIFE_TPU_CAT_INTERP", "0")
        b = RIFE(model, dtype="float32").process_batch(f0, f1, ts)
        np.testing.assert_array_equal(a, b)
