"""A/B the rife-v2.3 1080p B=4 step across layout-execution modes in one
process: whole-net BHCW planar executors (the current default), the
region-planned executor (wide conv stacks NHWC, narrow chains planar), and
flat NHWC.  Run after the u8-provenance change to also pick up the six
flownet image warps moving to the u8-quad kernel.

Run: python -u tools/v23_mode_ab.py [B]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODES = [
    ("planar whole-net (default)", {
        "RIFE_TPU_PLANAR": "1", "RIFE_TPU_LAYOUT": "nhwc",
    }),
    ("region + conv/deconv anchors", {
        "RIFE_TPU_PLANAR": "0",
        "RIFE_TPU_LAYOUT": "region",
        "RIFE_TPU_LAYOUT_CONV": "1",
        "RIFE_TPU_LAYOUT_DECONV": "1",
    }),
    ("flat NHWC", {
        "RIFE_TPU_PLANAR": "0", "RIFE_TPU_LAYOUT": "nhwc",
    }),
]


def main():
    import jax
    import jax.numpy as jnp

    from bench import H, W, _frames

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    in0, in1 = _frames(B)
    ts = np.full((B,), 0.5, np.float32)

    for label, env in MODES:
        os.environ.update(env)
        from rife_tpu.engine.session import RIFE

        session = RIFE("rife-v2.3", dtype="bfloat16")
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
        print(f"{label:32s}: {el * 1e3:7.1f} ms/step  {B / el:6.2f} fps",
              flush=True)


if __name__ == "__main__":
    main()
