"""Full-pipeline parity: the JAX engine vs the independent NumPy oracle.

This is the top-level correctness gate (SURVEY.md §4): every stage —
preprocess, flownet, (slice), contextnet, fusionnet / v4 pyramid,
postprocess — validated end-to-end as u8 frames.  PSNR > 50 dB is the
bit-comparable threshold from BASELINE.md.
"""

import numpy as np
import pytest

from rife_tpu.engine import oracle
from rife_tpu.engine.session import RIFE
from rife_tpu.models.zoo import load_model


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(255.0**2 / mse)


def frames(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (1, h, w, 3)).astype(np.uint8)
    shifted = np.roll(base, 2, axis=2)  # simple horizontal motion
    return base, shifted


@pytest.mark.parametrize("model_name,family_kwargs", [
    ("rife-v2.3", {}),
    ("rife-v4.6", {}),
    ("rife-v2.3", {"uhd": True}),
])
def test_engine_matches_oracle(model_name, family_kwargs):
    uhd = family_kwargs.get("uhd", False)
    in0, in1 = frames(64, 64, 1)
    model = load_model(model_name)
    golden = oracle.interpolate(model, in0, in1, 0.5, uhd=uhd)

    session = RIFE(model_name, uhd_mode=uhd)
    got = session.process(in0[0], in1[0], 0.5)

    p = psnr(golden[0], got)
    assert p > 50.0, f"PSNR {p:.1f} dB below bit-comparable threshold"
    # and the interpolation actually did something frame-like
    assert got.shape == (64, 64, 3)
    assert psnr(got, in0[0]) < p  # closer to the oracle than to an input
