"""A/B the v4.6 headline across layout-execution modes in one process.

Modes: flat NHWC; region plan with planar conv+deconv anchors; same with
PixelShuffle forced NHWC (RIFE_TPU_LAYOUT_PS=0 — the planar interleave
measured slower than the lane-padded NHWC form).

Run: python -u tools/region_ab.py [B]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODES = [
    ("nhwc", {"RIFE_TPU_LAYOUT": "nhwc"}),
    ("region+conv+deconv+fusedPS", {
        "RIFE_TPU_LAYOUT": "region",
        "RIFE_TPU_LAYOUT_CONV": "1",
        "RIFE_TPU_LAYOUT_DECONV": "1",
        "RIFE_TPU_FUSE_PS": "1",
    }),
    ("region+conv+deconv, no PS fusion, ps=nhwc (round-3 pre-fusion best)", {
        "RIFE_TPU_LAYOUT": "region",
        "RIFE_TPU_LAYOUT_CONV": "1",
        "RIFE_TPU_LAYOUT_DECONV": "1",
        "RIFE_TPU_FUSE_PS": "0",
        "RIFE_TPU_LAYOUT_PS": "0",
    }),
    ("region, absorber-only anchors (round-4 default)", {
        "RIFE_TPU_LAYOUT": "region",
        "RIFE_TPU_LAYOUT_CONV": "0",
        "RIFE_TPU_LAYOUT_DECONV": "0",
        "RIFE_TPU_FUSE_PS": "1",
        "RIFE_TPU_LAYOUT_PS": "1",
    }),
]


def main():
    import jax
    import jax.numpy as jnp

    from bench import _frames, H, W

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    in0, in1 = _frames(B)
    ts = np.full((B,), 0.5, np.float32)

    for label, env in MODES:
        os.environ.update(env)
        from rife_tpu.engine.session import RIFE

        session = RIFE("rife-v4.6", dtype="bfloat16")
        step = session._get_step(B, H, W)
        d0 = jax.device_put(jnp.asarray(in0), session.device)
        d1 = jax.device_put(jnp.asarray(in1), session.device)
        dt = jax.device_put(jnp.asarray(ts), session.device)

        def sync(x):
            return np.asarray(x[0, 0, 0, 0])

        out = step(session.weights, d0, d1, dt)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = step(session.weights, d0, d1, dt)
        sync(out)
        el = (time.perf_counter() - t0) / 5
        print(f"{label:32s}: {el*1e3:7.1f} ms/step  "
              f"{B/el:6.2f} fps", flush=True)


if __name__ == "__main__":
    main()
