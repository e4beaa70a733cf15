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
