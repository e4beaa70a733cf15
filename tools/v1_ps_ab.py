"""A/B the v1-family (rife) 1080p B=4 step with and without the
PixelShuffle-into-conv fusion (graph/rewrite.py fuse_pixelshuffle_into_convs).

The v1 nets run whole-net planar by default; unfused, each of their
Conv->PixelShuffle decoder tails pays the BHCW 6D-transpose interleave
(planar_ops._op_pixelshuffle).  Fused, the shuffle is a weight permutation
plus one W lane-interleave (conv_planar.conv_ps_planar).

Run: python -u tools/v1_ps_ab.py [model] [B]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODES = [
    ("fused PS (default)", {"RIFE_TPU_FUSE_PS": "1"}),
    ("unfused PS", {"RIFE_TPU_FUSE_PS": "0"}),
]


def main():
    import jax
    import jax.numpy as jnp

    from bench import H, W, _frames

    model = sys.argv[1] if len(sys.argv) > 1 else "rife"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    in0, in1 = _frames(B)
    ts = np.full((B,), 0.5, np.float32)

    for label, env in MODES:
        os.environ.update(env)
        from rife_tpu.engine.session import RIFE

        session = RIFE(model, dtype="bfloat16")
        step = session._get_step(B, H, W)
        d0 = jax.device_put(jnp.asarray(in0), session.device)
        d1 = jax.device_put(jnp.asarray(in1), session.device)
        dt = jax.device_put(jnp.asarray(ts), session.device)

        def sync(x):
            return np.asarray(x[0, 0, 0, 0])

        sync(step(session.weights, d0, d1, dt))
        iters = 4
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = step(session.weights, d0, d1, dt)
        sync(out)
        t = (time.perf_counter() - t0) / iters
        print(f"{model} {label:22s}: {t*1e3:8.1f} ms/step "
              f"{B/t:6.2f} frames/s/chip")


if __name__ == "__main__":
    main()
