"""Experiment: how smooth are the synthetic flownet's flows under different
weight-synthesis structures?  Runs on CPU at reduced resolution.

Real RIFE flow fields are spatially smooth (locally near-constant); iid
random conv weights instead act as cascaded random high-pass filters and
produce spatially-white "flows" — adversarial for any flow-adaptive kernel
and unrepresentative of any trained model.  This script compares:

  iid       — current He-init (baseline)
  env       — binomial spatial envelope x iid channel mixing (each conv
              becomes blur + random channel mix -> smooth by construction)
  env+tie4  — same, plus deconv output channels tied in groups of 4 so the
              PixelShuffle x2 head doesn't interleave 4 unrelated mixes into
              a pixel-level checkerboard

Metric: mean per-(8x128)-stripe y-delta spread of the final full-res flow —
the direct driver of the Pallas warp kernel's iteration count.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

TH, LANE = 8, 128
TEST_HW = (256, 512)  # lane/band-aligned so the spread metric sees no padding


def stripe_delta_spread(flow, h, w):
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    sy = gy + flow[..., 1]
    y0 = np.clip(np.floor(sy), 0, h - 1).astype(np.int32)
    hp = (h + TH - 1) // TH * TH
    wp = (w + LANE - 1) // LANE * LANE
    y0p = np.pad(y0, ((0, hp - h), (0, wp - w)))
    rows = np.arange(hp)[:, None].astype(np.int32)
    d0 = y0p - rows

    def per_stripe(a, red):
        s = a.reshape(hp // TH, TH, wp // LANE, LANE)
        return red(red(s, axis=3), axis=1)

    spread = per_stripe(d0, np.max) - per_stripe(d0, np.min) + 2
    return float(spread.mean())


def run(mode: str, scale: float):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rife_tpu.graph.executor import Executor
    from rife_tpu.graph import weights as wmod
    from rife_tpu.models.zoo import load_model
    from rife_tpu.ops import jax_ops

    os.environ["RIFE_TPU_SYNTH_MODE"] = mode
    m = load_model("rife-v4.6")
    graph = m.flownet.graph
    w = wmod.synthesize_weights(graph, "rife-v4.6/flownet")
    for lw in w.values():
        if lw.weight is not None:
            lw.weight = lw.weight * scale
    prep = jax_ops.prepare_weights(graph, w)
    ex = Executor(graph, jax_ops.OP_TABLE, w, ctx={"w": prep})
    h, wd = TEST_HW
    from PIL import Image

    def load(path):
        with Image.open(path) as im:
            return np.asarray(
                im.convert("RGB").resize((wd, h), Image.BILINEAR), np.float32
            ) / 255.0

    i0 = jnp.asarray(load("/root/reference/images/0.png")[None])
    i1 = jnp.asarray(load("/root/reference/images/1.png")[None])
    ins = {"in0": i0, "in1": i1, "in2": jnp.full((1, h, wd, 1), 0.5)}
    f = np.asarray(ex.run(ins, ["flow3"])[0], np.float32)[0, ..., :2]
    spread = stripe_delta_spread(f, h, wd)
    print(
        f"mode={mode:9s} scale={scale:5.3f}: flow std {f.std():7.2f}px "
        f"absmax {np.abs(f).max():7.1f} stripe-dy-spread {spread:6.2f}",
        flush=True,
    )
    return f.std()


if __name__ == "__main__":
    modes = sys.argv[1:] or ["env+tie4", "mix"]
    for mode in modes:
        # binary-search the scale to flow std ~6px at base res
        lo, hi = 0.3, 1.2
        for _ in range(9):
            mid = (lo * hi) ** 0.5
            std = run(mode, mid)
            if std > 6.0:
                hi = mid
            else:
                lo = mid
        scale = (lo * hi) ** 0.5
        print(f"--- {mode}: calibrated scale {scale:.4f}; res transfer:")
        # resolution-transfer check: same scale at 2x res
        saved = TEST_HW
        TEST_HW = (512, 1024)
        run(mode, scale)
        TEST_HW = saved
