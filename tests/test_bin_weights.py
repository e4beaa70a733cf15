"""Weight-stream reader tests against the real .bin files present in the
mount (the nine contextnet.bin files; everything else is listed in
/root/reference/.MISSING_LARGE_BLOBS) plus the synthetic fallback."""

import glob

import numpy as np
import pytest

from rife_tpu.graph.param import parse_param
from rife_tpu.graph.weights import (
    expected_weight_layers,
    load_bin,
    synthesize_weights,
)

REAL_BINS = sorted(glob.glob("/root/reference/models/*/*.bin"))


def test_nine_real_bins_present():
    assert len(REAL_BINS) == 9


@pytest.mark.parametrize("path", REAL_BINS, ids=lambda p: p.split("/")[-2])
def test_load_real_bin_byte_exact(path):
    g = parse_param(path.replace(".bin", ".param"))
    weights = load_bin(g, path)  # raises on under/over-run -> byte-exact
    assert set(weights) == set(expected_weight_layers(g))
    for node in g.nodes:
        if node.type == "Convolution":
            w = weights[node.name].weight
            assert w.shape[0] == int(node.p(0))
            assert w.shape[2] == w.shape[3] == int(node.p(1))
            assert w.size == int(node.p(6))
            if int(node.p(5)) == 1:
                assert weights[node.name].bias.shape == (int(node.p(0)),)
            assert np.isfinite(w).all()
            # fp16-storage weights must be representable values
            assert np.abs(w).max() < 1e4


def test_v23_contextnet_known_statistics():
    """The v2.3 contextnet stream layout was verified byte-exact in
    SURVEY.md §2.3 (1,189,728 fp16 weights + 10 flags + 1024 bias + 1024
    slopes = 2,387,688 bytes)."""
    base = "/root/reference/models/rife-v2.3/contextnet"
    g = parse_param(base + ".param")
    weights = load_bin(g, base + ".bin")
    n_weights = sum(
        lw.weight.size for lw in weights.values() if lw.weight is not None
    )
    n_bias = sum(lw.bias.size for lw in weights.values() if lw.bias is not None)
    n_slopes = sum(
        lw.slope.size for lw in weights.values() if lw.slope is not None
    )
    assert n_weights == 1_189_728
    assert n_bias + n_slopes == 2048


def test_synthetic_weights_deterministic_and_shape_compatible():
    g = parse_param("/root/reference/models/rife-v4.6/flownet.param")
    w1 = synthesize_weights(g, "rife-v4.6/flownet")
    w2 = synthesize_weights(g, "rife-v4.6/flownet")
    assert set(w1) == set(expected_weight_layers(g))
    for name in w1:
        for field in ("weight", "bias", "slope"):
            a, b = getattr(w1[name], field), getattr(w2[name], field)
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_array_equal(a, b)
    # different tag -> different weights
    w3 = synthesize_weights(g, "other-tag")
    some = next(n for n in w1 if w1[n].weight is not None)
    assert not np.array_equal(w1[some].weight, w3[some].weight)
