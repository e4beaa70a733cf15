"""Throughput vs batch size for the fused v4.6 1080p step (real chip)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.engine.session import RIFE

    H, W = 1080, 1920
    from PIL import Image

    def load(path):
        with Image.open(path) as im:
            return np.asarray(
                im.convert("RGB").resize((W, H), Image.BILINEAR), np.uint8
            )

    f0, f1 = load("/root/reference/images/0.png"), load("/root/reference/images/1.png")
    session = RIFE("rife-v4.6", dtype="bfloat16")
    dev = session.device

    def sync(x):
        return np.asarray(x[0, 0, 0, 0])

    import sys
    batches = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    for b in batches:
        in0 = np.broadcast_to(f0, (b, H, W, 3)).copy()
        in1 = np.broadcast_to(f1, (b, H, W, 3)).copy()
        ts = jnp.full((b,), 0.5, jnp.float32)
        d0 = jax.device_put(jnp.asarray(in0), dev)
        d1 = jax.device_put(jnp.asarray(in1), dev)
        step = session._get_step(b, H, W)
        try:
            sync(step(session.weights, d0, d1, ts))
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                out = step(session.weights, d0, d1, ts)
            sync(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"B={b}: {dt*1e3:8.1f} ms  {b/dt:6.2f} fps/chip")
        except Exception as e:  # noqa: BLE001
            print(f"B={b}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
