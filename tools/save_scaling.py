"""Save-stage throughput vs jobs_save and sink format (host-only, no TPU).

Feeds pre-rendered 1080p frames through the save stage's encode pool
(ThreadPoolExecutor(jobs_save) over rife_tpu.io.image.encode_image — the
exact code path of PipelineRunner._save) writing to local disk, for
jobs_save in {2, 8, 16} x {png, jpg, webp}.  Reports delivered frames/s
and the cores-per-chip ratio a deployment needs to keep the device step
(BENCH headline) fed.

NOTE on this host: it has ONE CPU core (nproc=1), so aggregate rates
cannot exceed the single-core rate regardless of jobs_save; the table
demonstrates (a) the per-frame encode cost per format and (b) that extra
encode threads do not LOSE throughput (the native encoders release the
GIL — native/rife_io.cpp; a held GIL would serialize and add contention).
True multi-core scaling needs a production host; the expected rate is
cores x the single-core rate since frames encode independently.
Reference counterpart: the save threads of /root/reference/src/main.cpp:
368-436 (stb PNG / JPEG q100 / WebP lossless).

Run: python -u tools/save_scaling.py [n_frames]
"""

from __future__ import annotations

import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from rife_tpu.io.image import encode_image

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rng = np.random.default_rng(0)
    # real-ish content: smooth gradients + noise (pure noise is a PNG
    # worst case, flat frames an unrealistic best case)
    gy, gx = np.mgrid[0:1080, 0:1920]
    base = (
        np.stack([gy % 256, gx % 256, (gy + gx) % 256], -1).astype(np.uint8)
    )
    frames = [
        np.clip(base.astype(np.int16)
                + rng.integers(-20, 20, base.shape), 0, 255).astype(np.uint8)
        for _ in range(min(n, 8))
    ]

    print(f"nproc={__import__('os').cpu_count()}  frames={n}  1080p")
    headline_fps = 49.3  # BENCH headline (device step, frames/s/chip)
    for fmt in ("png", "jpg", "webp"):
        for jobs in (2, 8, 16):
            with tempfile.TemporaryDirectory() as td:
                t0 = time.perf_counter()
                with ThreadPoolExecutor(jobs) as pool:
                    futs = [
                        pool.submit(encode_image,
                                    f"{td}/{i:08d}.{fmt}",
                                    frames[i % len(frames)])
                        for i in range(n)
                    ]
                    for f in futs:
                        f.result()
                dt = time.perf_counter() - t0
                rate = n / dt
                print(
                    f"{fmt:5s} jobs_save={jobs:2d}: {rate:7.2f} frames/s "
                    f"({dt / n * 1e3:6.1f} ms/frame); cores/chip to match "
                    f"{headline_fps} fps device step: "
                    f"{headline_fps / rate:6.1f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
