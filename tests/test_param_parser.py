"""Parser coverage over every shipped .param graph (SURVEY.md §2.3)."""

import glob
import os

import pytest

from rife_tpu.graph.param import parse_param

ALL_PARAMS = sorted(glob.glob("/root/reference/models/*/*.param"))

# layer-type histogram across all 29 files, from SURVEY.md §2.3
EXPECTED_TOTALS = {
    "Convolution": 640,
    "PReLU": 585,
    "Split": 495,
    "BinaryOp": 492,
    "InnerProduct": 244,
    "Input": 141,
    "Interp": 136,
    "Crop": 134,
    "Concat": 123,
    "Pooling": 122,
    "rife.Warp": 118,
    "Deconvolution": 67,
    "ReLU": 32,
    "PixelShuffle": 22,
    "UnaryOp": 19,
    "Clip": 9,
    "Sigmoid": 5,
    "Eltwise": 5,
}


def test_found_all_29_param_files():
    assert len(ALL_PARAMS) == 29


@pytest.mark.parametrize("path", ALL_PARAMS, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_parse_declared_counts(path):
    g = parse_param(path)  # raises if layer/blob counts mismatch
    assert g.input_blobs
    # file order must be topological: every bottom already produced
    seen = set()
    for node in g.nodes:
        for b in node.bottoms:
            assert b in seen, f"{node.name} consumes unseen blob {b}"
        seen.update(node.tops)


def test_global_type_histogram_matches_survey():
    totals = {}
    for path in ALL_PARAMS:
        for t, n in parse_param(path).type_histogram().items():
            totals[t] = totals.get(t, 0) + n
    totals.pop("Input", None)
    expected = dict(EXPECTED_TOTALS)
    expected.pop("Input")
    assert totals == expected


def test_v46_flownet_structure():
    g = parse_param("/root/reference/models/rife-v4.6/flownet.param")
    assert g.input_blobs == ["in0", "in1", "in2"]
    for tap in ("flow0", "flow1", "flow2", "flow3", "out0"):
        assert tap in g.producer
    # pinning flow0..flow2 must shrink the subgraph needed for flow3
    full = g.required_nodes(["flow3"], g.input_blobs)
    pinned = g.required_nodes(
        ["flow3"], g.input_blobs + ["flow0", "flow1", "flow2"]
    )
    assert len(pinned) < len(full)


def test_v46_u8_image_blob_closure():
    """Every warp in the v4 flownet reads a Split copy of the u8-origin
    input frames — the set driving the u8-quad Pallas kernel dispatch."""
    g = parse_param("/root/reference/models/rife-v4.6/flownet.param")
    u8 = g.value_copies_of(["in0", "in1"])
    warps = g.layers_of_type("rife.Warp")
    assert len(warps) == 8
    assert all(n.bottoms[0] in u8 for n in warps)
    # flows must NOT be in the closure
    assert all(n.bottoms[1] not in u8 for n in warps)
    assert "flow0" not in u8 and "out0" not in u8


def test_v23_fusionnet_u8_closure_covers_image_warps_only():
    g = parse_param("/root/reference/models/rife-v2.3/fusionnet.param")
    u8 = g.value_copies_of(["img0", "img1"])
    warps = g.layers_of_type("rife.Warp")
    assert len(warps) >= 2
    assert all(n.bottoms[0] in u8 for n in warps)
    # contextnet warps features (conv outputs) — none may be tagged
    ctx = parse_param("/root/reference/models/rife-v2.3/contextnet.param")
    u8c = ctx.value_copies_of([])  # no image seeds in contextnet
    assert all(n.bottoms[0] not in u8c for n in ctx.layers_of_type("rife.Warp"))


def test_v23_net_interfaces():
    base = "/root/reference/models/rife-v2.3"
    flownet = parse_param(f"{base}/flownet.param")
    assert flownet.input_blobs == ["input0", "input1"]
    assert "flow" in flownet.producer
    ctx = parse_param(f"{base}/contextnet.param")
    assert ctx.input_blobs == ["input.1", "flow.0"]
    for f in ("f1", "f2", "f3", "f4"):
        assert f in ctx.producer
    fus = parse_param(f"{base}/fusionnet.param")
    assert set(fus.input_blobs) == {
        "img0", "img1", "flow", "3", "4", "5", "6", "7", "8", "9", "10"
    }
    assert "output" in fus.producer


def test_value_copies_through_concat_split_crop():
    """The v2/v3 flownets warp channel-crops of Concat(input0, input1)
    (models/rife-v2.3/flownet.param Slice_29/45/88/104/148/164) — pure data
    movement, so the u8-quad warp kernel stays eligible for all of them."""
    g = parse_param("/root/reference/models/rife-v2.3/flownet.param")
    u8 = g.value_copies_of(["input0", "input1"])
    warps = g.layers_of_type("rife.Warp")
    assert len(warps) == 6
    assert all(n.bottoms[0] in u8 for n in warps)
    # flow slices (channels of a conv output) must never be tagged
    assert all(n.bottoms[1] not in u8 for n in warps)


def test_value_copies_through_identity_interp():
    """rife-v3.1 gates its image slices behind a scale-1.0 Interp (an
    identity); the closure must see through it."""
    g = parse_param("/root/reference/models/rife-v3.1/flownet.param")
    u8 = g.value_copies_of(["input0", "input1"])
    warps = g.layers_of_type("rife.Warp")
    assert len(warps) == 4
    assert all(n.bottoms[0] in u8 for n in warps)


def test_value_copies_rejects_real_resizes():
    """rife-anime downscales the concat 0.5x before slicing — resized
    values are no longer exact u8 multiples, so nothing may be tagged."""
    g = parse_param("/root/reference/models/rife-anime/flownet.param")
    u8 = g.value_copies_of(["input0", "input1"])
    assert all(n.bottoms[0] not in u8 for n in g.layers_of_type("rife.Warp"))


def test_value_copies_rejects_mid_segment_crop():
    from rife_tpu.graph.ir import Graph, LayerNode

    nodes = [
        LayerNode("Input", "in0", [], ["a"]),
        LayerNode("Input", "in1", [], ["b"]),
        LayerNode("Concat", "cat", ["a", "b"], ["ab"], {0: 0}),
        # channels [2, 4): crosses the a|b boundary mid-segment
        LayerNode("Crop", "bad", ["ab"], ["mid"],
                  {-23309: [2], -23310: [4], -23311: [0]}),
        # channels [3, 6): exactly b
        LayerNode("Crop", "good", ["ab"], ["bcopy"],
                  {-23309: [3], -23310: [2147483647], -23311: [0]}),
    ]
    producer = {}
    for i, n in enumerate(nodes):
        for s, t in enumerate(n.tops):
            producer[t] = (i, s)
    g = Graph(nodes=nodes, producer=producer, input_blobs=["a", "b"])
    u8 = g.value_copies_of(["a", "b"])
    assert "ab" in u8  # a concat of seeds is still u8-exact per channel
    assert "bcopy" in u8
    assert "mid" not in u8


def test_unsupported_enabled_kinds_error_at_parse_time():
    """Flatten/Padding/Cast/Packing are enabled by the reference build
    (src/CMakeLists.txt) but used by no shipped graph; parsing one must
    fail with a clear message, not a KeyError at run time."""
    import pytest

    from rife_tpu.graph.param import parse_param_text

    text = "7767517\n2 2\nInput in0 0 1 in0\nFlatten fl_0 1 1 in0 out0\n"
    with pytest.raises(ValueError, match="Flatten.*not supported"):
        parse_param_text(text)
