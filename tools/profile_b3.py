"""Attribute block3's cost op-group by op-group (real v4.6 graph, B=24).

After pinning flow0..flow2, jit programs that extract successive block3
blobs (param blob names, /root/reference/models/rife-v4.6/flownet.param:
152-217) and print the marginal time of each segment:

  246    flow input to block3 (incl. upsample_16 x2 full-res Interp)
  256    warp_5 (full-res, u8-quad Pallas)
  258    warp_4 (second warp)
  262    concat (12ch full-res)
  264    convrelu_6 (s2 -> 544x960, Cout=32)
  265    convrelu_7 (s2 -> 272x480, Cout=64)
  320    8 residual convs C=64
  321    deconv_63 (4x4 s2 -> 544x960, Cout=24)
  flow3  pixelshuffle + slices
  out0   render (warp_6/7 + blend) + postproc

Run: python -u tools/profile_b3.py [B]
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
            pinned = {}
            for fi in range(3):
                pinned[pipelines.V4_TAPS[fi]] = pipelines._v4_flow_pyramid(
                    ex, cfg, Wts, img0, img1, t, pinned
                )
            ctx = pipelines._mkctx(cfg, Wts, "flownet")
            inputs = {"in0": img0, "in1": img1, "in2": t}
            inputs.update(pinned)
            if blobs == ["out0+post"]:
                out = ex.run(inputs, ["out0"], ctx)[0]
                return frame.postprocess(out, H, W)
            return ex.run(inputs, blobs, ctx)[-1]

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
        ("prefix flow0..2 + 246", ["246"]),
        ("warp_5 (256)", ["246", "256"]),
        ("warp_4 (258)", ["246", "256", "258"]),
        ("concat (262)", ["246", "262"]),
        ("convrelu_6 (264)", ["246", "264"]),
        ("convrelu_7 (265)", ["246", "265"]),
        ("body x8 (320)", ["246", "320"]),
        ("deconv_63 (321)", ["246", "321"]),
        ("flow3", ["246", "flow3"]),
        ("out0 + post", ["out0+post"]),
    ]
    prev = 0.0
    for label, blobs in stages:
        try:
            dt = timeit(make_upto(blobs))
        except Exception as e:  # noqa: BLE001 - print and continue
            print(f"{label:24s}: FAILED {type(e).__name__}: {e}")
            continue
        print(f"{label:24s}: {dt*1e3:8.1f} ms  (marginal {(dt-prev)*1e3:+8.1f} ms)",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
