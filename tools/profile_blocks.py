"""Per-pyramid-level cost of the v4.6 step at the headline config (real chip).

Times jitted subgraphs that extract flow0, flow0..flow1, ..., then out0 —
differences give each IFBlock's marginal cost inside the fused program
(taps are pinned, so no prefix re-execution; pipelines._v4_flow_pyramid).

Run:  python -u tools/profile_blocks.py [B]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.engine import pipelines
    from rife_tpu.engine.session import RIFE, pad_to
    from rife_tpu.ops import frame

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    H, W = 1080, 1920
    ph, pw = pad_to(H), pad_to(W)

    from PIL import Image

    def load(path):
        with Image.open(path) as im:
            return np.asarray(
                im.convert("RGB").resize((W, H), Image.BILINEAR), np.uint8
            )

    f0 = np.broadcast_to(load("/root/reference/images/0.png"), (B, H, W, 3)).copy()
    f1 = np.broadcast_to(load("/root/reference/images/1.png"), (B, H, W, 3)).copy()

    s = RIFE("rife-v4.6", dtype="bfloat16")
    ex = s.executors["flownet"]
    cfg = s.cfg

    def make_upto(n_taps, with_out):
        def fn(Wts, in0_u8, in1_u8, ts):
            img0 = frame.preprocess(in0_u8, ph, pw, cfg.jdtype)
            img1 = frame.preprocess(in1_u8, ph, pw, cfg.jdtype)
            t = frame.timestep_plane(ts, B, ph, pw, cfg.jdtype)
            pinned = {}
            for fi in range(n_taps):
                pinned[pipelines.V4_TAPS[fi]] = pipelines._v4_flow_pyramid(
                    ex, cfg, Wts, img0, img1, t, pinned
                )
            if with_out:
                out = pipelines._v4_out(ex, cfg, Wts, img0, img1, t, pinned)
                return frame.postprocess(out, H, W)
            return pinned[pipelines.V4_TAPS[n_taps - 1]]

        return jax.jit(fn)

    d0 = jax.device_put(jnp.asarray(f0), s.device)
    d1 = jax.device_put(jnp.asarray(f1), s.device)
    ts = jax.device_put(jnp.full((B,), 0.5, jnp.float32), s.device)

    def sync(x):
        return np.asarray(x.ravel()[0])

    def timeit(fn, iters=5):
        sync(fn(s.weights, d0, d1, ts))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(s.weights, d0, d1, ts)
        sync(out)
        return (time.perf_counter() - t0) / iters

    prev = 0.0
    for n in (1, 2, 3, 4):
        dt = timeit(make_upto(n, False))
        print(f"taps flow0..flow{n-1}: {dt*1e3:8.1f} ms  (block{n-1} marginal "
              f"{(dt-prev)*1e3:+8.1f} ms)")
        prev = dt
    dt = timeit(make_upto(4, True))
    print(f"full out0 (pinned):  {dt*1e3:8.1f} ms  (render+post marginal "
          f"{(dt-prev)*1e3:+8.1f} ms)")
    print(f"fps at B={B}: {B/dt:.2f}")


if __name__ == "__main__":
    main()
