"""Benchmark matrix over the BASELINE.md target configs (real chip).

Prints one line per config: interpolated frames/sec/chip for the fused
device step (inputs pre-staged, one sync after all iters — same protocol
as bench.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_matrix.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = [
    # (label, model, kwargs, resolution, batch, iters)
    ("v4.6 1080p 2x B=8", "rife-v4.6", {}, (1080, 1920), 8, 6),
    ("v4.6 720p 2x B=8", "rife-v4.6", {}, (720, 1280), 8, 6),
    ("v2.3 1080p 2x B=4", "rife-v2.3", {}, (1080, 1920), 4, 4),
    ("v1 (rife) 1080p 2x B=4", "rife", {}, (1080, 1920), 4, 4),
    ("v1 (anime) 1080p 2x B=4", "rife-anime", {}, (1080, 1920), 4, 4),
    ("v3.1 1080p 2x B=4", "rife-v3.1", {}, (1080, 1920), 4, 4),
    ("v4.6 1080p -x TTA B=1", "rife-v4.6", {"tta_mode": True}, (1080, 1920), 1, 3),
    ("v4.6 1080p -z TTA B=2", "rife-v4.6", {"tta_temporal_mode": True}, (1080, 1920), 2, 3),
    ("v2.3 1080p -x TTA B=1", "rife-v2.3", {"tta_mode": True}, (1080, 1920), 1, 3),
    ("v2.3 4K UHD -u B=1", "rife-v2.3", {"uhd_mode": True}, (2160, 3840), 1, 2),
]


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rife_tpu.engine.session import RIFE

    dev = jax.devices()[0]
    print("device:", dev.platform)

    def frames(h, w, b):
        def load(path):
            with Image.open(path) as im:
                return np.asarray(
                    im.convert("RGB").resize((w, h), Image.BILINEAR), np.uint8
                )

        f0 = load("/root/reference/images/0.png")
        f1 = load("/root/reference/images/1.png")
        return (
            np.broadcast_to(f0, (b, h, w, 3)).copy(),
            np.broadcast_to(f1, (b, h, w, 3)).copy(),
        )

    def sync(x):
        return np.asarray(x[0, 0, 0, 0])

    for label, model, kwargs, (h, w), b, iters in CONFIGS:
        try:
            session = RIFE(model, dtype="bfloat16", **kwargs)
            in0, in1 = frames(h, w, b)
            d0 = jax.device_put(jnp.asarray(in0), dev)
            d1 = jax.device_put(jnp.asarray(in1), dev)
            ts = jnp.full((b,), 0.5, jnp.float32)
            step = session._get_step(b, h, w)
            sync(step(session.weights, d0, d1, ts))
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = step(session.weights, d0, d1, ts)
            sync(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"{label:26s}: {dt*1e3:8.1f} ms/step  {b/dt:6.2f} frames/s/chip")
        except Exception as e:  # noqa: BLE001
            print(f"{label:26s}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
