"""Time the u8 warp variants standalone on the v4.6 step's ACTUAL flows.

The in-program trace attributes ~35 ms to each of the six full-res warp
pallas_calls at B=24 (auto->slab), while tools/warp_floor.py's synthetic
smooth-sin flows measure band/delta at ~8 ms — this tool closes that gap
by extracting the real flow tensors the graph feeds warp_2..warp_7
(flow taps upsampled exactly as pipelines does) and timing every variant
on them, plus the per-stripe iteration stats (tools/flow_stats.py logic).

Run: python -u tools/warp_inprog.py [B]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TH, LANE = 8, 128


def stripe_stats(flow_full, h, w):
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = gx + flow_full[..., 0]
    sy = gy + flow_full[..., 1]
    x0 = np.clip(np.floor(sx), 0, w - 1).astype(np.int32)
    y0 = np.clip(np.floor(sy), 0, h - 1).astype(np.int32)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    hp = (h + TH - 1) // TH * TH
    wp = (w + LANE - 1) // LANE * LANE
    pad = ((0, hp - h), (0, wp - w))
    y0p, y1p = np.pad(y0, pad), np.pad(y1, pad)
    x0p, x1p = np.pad(x0, pad), np.pad(x1, pad)
    rows = np.arange(hp)[:, None].astype(np.int32)
    d0, d1 = y0p - rows, y1p - rows

    def per_stripe(a, red):
        s = a.reshape(hp // TH, TH, wp // LANE, LANE)
        return red(red(s, axis=3), axis=1)

    bands = per_stripe(y1p, np.max) // TH - per_stripe(y0p, np.min) // TH + 1
    tiles = per_stripe(x1p, np.max) // LANE - per_stripe(x0p, np.min) // LANE + 1
    deltas = per_stripe(d1, np.max) - per_stripe(d0, np.min) + 1
    return dict(
        bands=float(bands.mean()), tiles=float(tiles.mean()),
        deltas=float(deltas.mean()),
        band_iters=float((bands * 8 * tiles).mean()),
        delta_iters=float((deltas * tiles).mean()),
        std=float(flow_full.std()), absmax=float(np.abs(flow_full).max()),
    )


def main():
    import jax
    import jax.numpy as jnp

    from bench import _frames
    from rife_tpu.engine.session import RIFE
    from rife_tpu.ops import frame
    from rife_tpu.ops.jax_ops import resize2d
    from rife_tpu.ops.warp_pallas import warp_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    pad_h, pad_w = 1088, 1920

    session = RIFE("rife-v4.6", dtype="bfloat16")
    ex = session.executors["flownet"]
    in0, in1 = _frames(1)
    img0 = frame.preprocess(jnp.asarray(in0), pad_h, pad_w, jnp.bfloat16)
    img1 = frame.preprocess(jnp.asarray(in1), pad_h, pad_w, jnp.bfloat16)
    t = frame.timestep_plane(0.5, 1, pad_h, pad_w, jnp.bfloat16)
    ctx = {"w": session.weights["flownet"]}
    taps = jax.jit(
        lambda i0, i1, tt: ex.run(
            {"in0": i0, "in1": i1, "in2": tt},
            ["flow0", "flow1", "flow2", "flow3"], ctx,
        )
    )(img0, img1, t)

    # warp_2/3 <- flow1 (block1 input), warp_4/5 <- flow2 (block2 input),
    # warp_6/7 <- flow3 (render); each upsampled to full res, values
    # scaled by the resolution ratio — identical to the graph's use
    img_u8 = np.broadcast_to(
        np.asarray(frame.preprocess(
            jnp.asarray(in0), pad_h, pad_w, jnp.bfloat16
        )).astype(np.float32), (B, pad_h, pad_w, 3)
    ).copy()
    di = jnp.asarray(img_u8, jnp.bfloat16)

    def timeit(fn, iters=10):
        out = fn()
        np.asarray(out[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[0, 0, 0, 0])
        return (time.perf_counter() - t0) / iters

    for name, f in zip(["flow1", "flow2", "flow3"], list(taps)[1:]):
        f = np.asarray(f.astype(jnp.float32))
        fh = f.shape[1]
        scale = pad_h // fh
        full = f[..., :2] if scale == 1 else np.asarray(
            resize2d(jnp.asarray(f[..., :2]), pad_h, pad_w)) * scale
        st = stripe_stats(full[0], pad_h, pad_w)
        print(f"{name} (x{scale}):",
              {k: round(v, 2) for k, v in st.items()}, flush=True)
        df = jnp.asarray(
            np.broadcast_to(full, (B, pad_h, pad_w, 2)).copy(), jnp.float32)
        for var in ["band", "delta", "slab", "sdelta"]:
            # NB: image/flow must be jit ARGUMENTS — closing over them
            # embeds them as HLO constants (hundreds of MB), which this
            # environment's remote-compile tunnel rejects (HTTP 413)
            g = jax.jit(functools.partial(
                warp_pallas, u8_origin=True, u8_variant=var))
            try:
                dt = timeit(lambda g=g: g(di, df))
                print(f"  {var:7s}: {dt*1e3:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {var:7s}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
