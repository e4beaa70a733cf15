"""Golden-frame regression tests (SURVEY.md §4: the reference's only
correctness anchor is a pair of committed example outputs; ours are
committed engine outputs that pin semantics across rounds).

Goldens are f32 CPU outputs with deterministic synthetic weights
(tests/make_goldens.py).  A failure here means engine semantics CHANGED —
regenerate goldens only if the change is intentional and understood.
"""


import numpy as np
import pytest
from PIL import Image

from rife_tpu.engine.session import RIFE

from make_goldens import CASES, GOLDEN_DIR, H, W, case_name, load_inputs

pytestmark = pytest.mark.skipif(
    not GOLDEN_DIR.exists(), reason="goldens not generated"
)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


@pytest.mark.slow
@pytest.mark.parametrize("model,kwargs,t", CASES)
def test_golden(model, kwargs, t):
    golden_path = GOLDEN_DIR / f"{case_name(model, kwargs, t)}.png"
    golden = np.asarray(Image.open(golden_path).convert("RGB"))
    f0, f1 = load_inputs()
    sess = RIFE(model, dtype="float32", **kwargs)
    out = sess.process(f0, f1, t)
    assert out.shape == golden.shape == (H, W, 3)
    p = psnr(out, golden)
    assert p > 45.0, f"{golden_path.name}: engine drifted from golden ({p:.1f} dB)"
