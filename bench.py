"""Benchmark: 1080p interpolated frames/sec/chip, rife-v4.6, 2x midpoint.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note (BASELINE.md): the reference publishes no numbers and cannot
run in this environment (no Vulkan device, ncnn submodule absent).  The
baseline constant below is the documented estimate of the reference's
single-GPU 1080p throughput: the upstream RIFE paper reports ~30 FPS for
2x 720p on an RTX 2080 Ti; scaled by pixel count to 1080p that is
30 * (1280*720)/(1920*1080) = 13.3 FPS.  The driver target (>=4x on a
v5e-4) therefore corresponds to vs_baseline >= 1.0 per chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_1080P_FPS = 13.3  # estimated reference single-GPU fps (see above)

H, W = 1080, 1920


def run(batch: int = 8, iters: int = 8, warmup: int = 2, dtype: str = "bfloat16"):
    import jax

    from rife_tpu.engine.session import RIFE

    session = RIFE("rife-v4.6", dtype=dtype)
    rng = np.random.default_rng(0)
    in0 = rng.integers(0, 256, (batch, H, W, 3)).astype(np.uint8)
    in1 = rng.integers(0, 256, (batch, H, W, 3)).astype(np.uint8)
    ts = np.full((batch,), 0.5, np.float32)

    # compile + warm
    for _ in range(warmup):
        out = session.process_batch(in0, in1, ts)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = session.process_batch(in0, in1, ts)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    assert out.shape == (batch, H, W, 3)
    return fps


def main():
    import jax

    platform = jax.devices()[0].platform
    # fall back to a tiny config if we're not on an accelerator (CI/CPU)
    if platform in ("cpu",):
        fps = run(batch=1, iters=1, warmup=1)
    else:
        fps = run()
    print(
        json.dumps(
            {
                "metric": "1080p_frames_per_sec_per_chip_rife_v4.6_2x",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_1080P_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
