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
