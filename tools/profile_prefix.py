"""Attribute the v4.6 step's PREFIX cost (blocks 0-2 + glue) blob by blob.

profile_b3.py showed block3 in detail; this walks the earlier pyramid levels
(param blob names, /root/reference/models/rife-v4.6/flownet.param:9-160):

  block0:  18 (1/8 input)  21 (enc)  76 (body)  flow0  (1/16 working res)
  glue0:   83 (flow x8 up, x8 mul)  89 (flow /4 for cat_4)  93/91 (WarpDs4)
  block1:  99 (cat_4 12ch @1/4)  102 (enc)  157 (body)  flow1  (1/8 res)
  glue1:   164 (flow acc)  174  176/178 (WarpDs4 @1/2)
  block2:  181 (cat_8 12ch @1/2)  184 (enc)  239 (body)  flow2  (1/4 res)

Run: python -u tools/profile_prefix.py [B]
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

    def make_upto(blobs):
        def fn(Wts, in0_u8, in1_u8, ts):
            img0 = frame.preprocess(in0_u8, ph, pw, cfg.jdtype)
            img1 = frame.preprocess(in1_u8, ph, pw, cfg.jdtype)
            t = frame.timestep_plane(ts, B, ph, pw, cfg.jdtype)
            ctx = pipelines._mkctx(cfg, Wts, "flownet")
            inputs = {"in0": img0, "in1": img1, "in2": t}
            outs = ex.run(inputs, blobs, ctx)
            return outs[-1]

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

    stages = [
        ("b0 enc in (18, 1/8 7ch)", ["18"]),
        ("b0 enc (21)", ["21"]),
        ("b0 body (76)", ["76"]),
        ("flow0", ["flow0"]),
        ("glue0 flow x8 (83)", ["83"]),
        ("glue0 flow /4 (89)", ["83", "89"]),
        ("glue0 warps (93+91)", ["83", "93", "91"]),
        ("b1 cat_4 (99)", ["99"]),
        ("b1 enc (102)", ["102"]),
        ("b1 body (157)", ["157"]),
        ("flow1", ["flow1"]),
        ("glue1 acc (164)", ["164"]),
        ("glue1 warps (178+176)", ["164", "178", "176"]),
        ("b2 cat_8 (181)", ["181"]),
        ("b2 enc (184)", ["184"]),
        ("b2 body (239)", ["239"]),
        ("flow2", ["flow2"]),
    ]
    prev = 0.0
    for label, blobs in stages:
        try:
            dt = timeit(make_upto(blobs))
        except Exception as e:  # noqa: BLE001 - print and continue
            print(f"{label:26s}: FAILED {type(e).__name__}: {e}")
            continue
        print(
            f"{label:26s}: {dt*1e3:8.1f} ms  (marginal {(dt-prev)*1e3:+8.1f} ms)",
            flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
