"""Regenerate tests/goldens/*.png — committed regression anchors.

Golden = f32 CPU engine output (XLA warp path, deterministic synthetic
weights) on the reference sample pair downscaled to 192x320.  Any future
change that shifts outputs by more than encode/round noise fails
tests/test_goldens.py, catching accidental semantic drift across rounds.

Run (CPU): JAX_PLATFORM_NAME=cpu python tests/make_goldens.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent.parent))

from rife_tpu.engine.session import RIFE  # noqa: E402

GOLDEN_DIR = Path(__file__).parent / "goldens"
H, W = 192, 320

CASES = [
    ("rife", {}, 0.5),
    ("rife-v2.3", {}, 0.5),
    ("rife-v4.6", {}, 0.5),
    ("rife-v4.6", {}, 0.25),
    ("rife-v2.3", {"tta_mode": True}, 0.5),
    ("rife-v4.6", {"tta_temporal_mode": True}, 0.5),
]


def load_inputs():
    def load(p):
        with Image.open(p) as im:
            return np.asarray(
                im.convert("RGB").resize((W, H), Image.BILINEAR), np.uint8
            )

    return (
        load("/root/reference/images/0.png"),
        load("/root/reference/images/1.png"),
    )


def case_name(model, kwargs, t):
    mods = "".join(f"_{k.split('_')[1] if '_' in k else k}" for k in sorted(kwargs))
    return f"{model}{mods}_t{t}".replace(".", "p")


def main():
    GOLDEN_DIR.mkdir(exist_ok=True)
    f0, f1 = load_inputs()
    for model, kwargs, t in CASES:
        sess = RIFE(model, dtype="float32", **kwargs)
        out = sess.process(f0, f1, t)
        name = case_name(model, kwargs, t)
        Image.fromarray(out).save(GOLDEN_DIR / f"{name}.png")
        print(f"golden {name}: mean={out.mean():.2f}")


if __name__ == "__main__":
    main()
