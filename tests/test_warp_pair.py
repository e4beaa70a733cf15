"""Sibling-warp pair fusion (graph/rewrite.py fuse_sibling_warps).

The v4 flownet warps BOTH frames at every refinement scale
(/root/reference/models/rife-v4.6/flownet.param warp_2/warp_3,
warp_4/warp_5); the rewrite pairs each sibling couple into one
rife.WarpPair (WarpDs4 couples into rife.WarpDs4Pair) so the Pallas pair
kernel pays the Mosaic per-cell fixed cost once for both.  These tests pin
(a) the rewrite's structure on the real graph — live pairs form, dead
warps are never resurrected into a live pair — and (b) full-forward
numeric equivalence with the rewrite on vs off (CPU path exercises the
fallback lowering; the fused-kernel exactness A/B lives in
tools/warp_pair_ab.py, measured max|diff| 0.0 on TPU).
"""

import numpy as np
import pytest

from rife_tpu.graph.param import parse_param
from rife_tpu.graph.rewrite import (
    fuse_quarter_downscaled_warps,
    fuse_render_blend,
    fuse_sibling_warps,
)

V46 = "/root/reference/models/rife-v4.6/flownet.param"


def _rewritten():
    g = parse_param(V46)
    # fuse_half=False mirrors the session default (engine/session.py)
    g = fuse_quarter_downscaled_warps(g, fuse_half=False)
    g = fuse_render_blend(g, frozenset(("out0",)))
    return g, fuse_sibling_warps(g)


def test_pairs_form_on_v46_flownet():
    g, g2 = _rewritten()
    hist = g2.type_histogram()
    assert hist.get("rife.WarpPair", 0) == 2  # warp_2/3 and warp_4/5
    assert hist.get("rife.WarpDs4Pair", 0) == 1
    assert hist.get("rife.WarpDs4", 0) == 0
    # the dead warps (warp_0/1 replaced by WarpDs4, warp_6/7 by the fused
    # render) survive unpaired — pairing one with a live warp would
    # resurrect it under the demand-driven executor
    assert hist.get("rife.Warp", 0) == 4
    # no blob disappears: every blob any node consumes still has a producer
    produced = {t for n in g2.nodes for t in n.tops} | set(g2.input_blobs)
    live = {b for n in g2.nodes for b in n.bottoms}
    dead_ok = {b for b in live if b not in produced}
    # original graph's dead-producer blobs only (R1/render leftovers)
    produced0 = {t for n in g.nodes for t in n.tops} | set(g.input_blobs)
    assert dead_ok <= {b for n in g.nodes for b in n.bottoms
                       if b not in produced0}


def test_no_self_dependent_pair_when_warp_consumes_sibling_output():
    """A warp whose flow (or image) IS another warp's output must never fuse
    with it: the pair would list its own top among its bottoms and the
    demand-driven executor would KeyError.  Unreachable in the shipped RIFE
    graphs (warps never consume warp outputs) but the rewrite is generic
    over any parsed param graph (advisor round-4 finding)."""
    from rife_tpu.graph.ir import Graph, LayerNode

    def node(t, name, bottoms, tops):
        return LayerNode(t, name, list(bottoms), list(tops), {})

    nodes = [
        node("Input", "in_img", [], ["img"]),
        node("Input", "in_flow", [], ["flow"]),
        node("rife.Warp", "warp_a", ["img", "flow"], ["wa"]),
        # warp_b consumes warp_a's top: case A fails (produced_at == i) and
        # case B's 'between' slice must include node j itself
        node("rife.Warp", "warp_b", ["wa", "flow"], ["wb"]),
        node("Concat", "sink", ["wa", "wb"], ["out"]),
    ]
    g = Graph(nodes=nodes,
              producer={t: (i, s) for i, n in enumerate(nodes)
                        for s, t in enumerate(n.tops)},
              input_blobs=["img", "flow"])
    g2 = fuse_sibling_warps(g)
    assert g2.type_histogram().get("rife.WarpPair", 0) == 0
    for n in g2.nodes:
        assert not (set(n.bottoms) & set(n.tops)), n.name


def test_pair_tops_order_matches_halves():
    _, g2 = _rewritten()
    for n in g2.nodes:
        if n.type in ("rife.WarpPair", "rife.WarpDs4Pair"):
            assert len(n.bottoms) == 4 and len(n.tops) == 2


@pytest.mark.parametrize("model", ["rife-v4.6", "rife-v4"])
def test_forward_equivalence_pair_on_off(model, monkeypatch):
    import jax

    from rife_tpu.engine.session import RIFE

    rng = np.random.default_rng(7)
    f0 = rng.integers(0, 256, (1, 96, 128, 3), np.uint8)
    f1 = rng.integers(0, 256, (1, 96, 128, 3), np.uint8)
    ts = np.array([0.5], np.float32)

    monkeypatch.setenv("RIFE_TPU_FUSE_WARPPAIR", "1")
    a = RIFE(model, dtype="float32").process_batch(f0, f1, ts)
    monkeypatch.setenv("RIFE_TPU_FUSE_WARPPAIR", "0")
    b = RIFE(model, dtype="float32").process_batch(f0, f1, ts)
    assert np.array_equal(a, b)
    del jax


def test_pair_gate_rejects_band_variant():
    """The session auto-probe pins warp_variant='band' for rough flows;
    the pair gate must reject it so paired warps fall back to the two
    single-warp lowerings that honor the band kernel (advisor round-4)."""
    from rife_tpu.ops.jax_ops import _pair_kernel_ok_base

    base = {"use_pallas_warp": True, "spatial_warp": None}
    assert _pair_kernel_ok_base({**base, "warp_variant": "auto"})
    assert _pair_kernel_ok_base({**base, "warp_variant": "slab"})
    assert not _pair_kernel_ok_base({**base, "warp_variant": "band"})
    assert not _pair_kernel_ok_base({**base, "warp_variant": "delta"})


def test_pair_api_boundary_errors():
    """4-channel images and blend-without-mask fail loudly at the API
    boundary instead of silently dropping a channel / raising an opaque
    AttributeError (advisor round-4)."""
    import jax.numpy as jnp

    from rife_tpu.ops.warp_pallas import warp_pallas_pair

    img3 = jnp.zeros((1, 16, 128, 3), jnp.float32)
    img4 = jnp.zeros((1, 16, 128, 4), jnp.float32)
    flow = jnp.zeros((1, 16, 128, 2), jnp.float32)
    with pytest.raises(ValueError, match="<=3 channels"):
        warp_pallas_pair(img4, flow, img4, flow)
    with pytest.raises(ValueError, match="mask"):
        warp_pallas_pair(img3, flow, img3, flow, blend=True)


def test_oracle_runs_pair_graph():
    """The numpy oracle's op table executes the paired graph: the fused
    warp-then-downscale pair matches the unfused graph bit-exactly."""
    from rife_tpu.graph.executor import Executor
    from rife_tpu.graph.weights import synthesize_weights
    from rife_tpu.ops import numpy_ref

    g, g2 = _rewritten()
    w = synthesize_weights(g, "rife-v4.6/flownet")
    rng = np.random.default_rng(5)
    b, h, wd = 1, 64, 64
    feeds = {
        "in0": rng.random((b, h, wd, 3)).astype(np.float32),
        "in1": rng.random((b, h, wd, 3)).astype(np.float32),
        "in2": rng.random((b, h, wd, 1)).astype(np.float32),
    }
    out_ref = Executor(g, numpy_ref.OP_TABLE, w).run(feeds, ["out0"])[0]
    out_pair = Executor(g2, numpy_ref.OP_TABLE, w).run(feeds, ["out0"])[0]
    np.testing.assert_array_equal(out_ref, out_pair)
