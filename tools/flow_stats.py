"""Measure the per-stripe iteration budget of the band-walk warp kernel on
the BENCH's actual flows (rife-v4.6, calibrated synthetic weights, real
frames at 1080p).

For each pyramid tap, upsample the accumulated flow to full resolution the
way the graph does, then compute per-(8x128)-stripe:
  bands = max(y1)//8 - min(y0)//8 + 1      (row-band iterations)
  tiles = max(x1)//128 - min(x0)//128 + 1  (lane-tile iterations)
  deltas = spread of (y0 - row) + 2        (delta-roll iterations)
and report means: the band kernel does bands*8*tiles row-iterations per
stripe, a delta-roll kernel would do deltas*tiles.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W = 1080, 1920
TH, LANE = 8, 128


def stripe_stats(flow, h, w):
    """flow: (h, w, 2) float at full res."""
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = gx + flow[..., 0]
    sy = gy + flow[..., 1]
    x0 = np.clip(np.floor(sx), 0, w - 1).astype(np.int32)
    y0 = np.clip(np.floor(sy), 0, h - 1).astype(np.int32)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    hp = (h + TH - 1) // TH * TH
    wp = (w + LANE - 1) // LANE * LANE
    pad = ((0, hp - h), (0, wp - w))
    y0p = np.pad(y0, pad)
    y1p = np.pad(y1, pad)
    x0p = np.pad(x0, pad)
    x1p = np.pad(x1, pad)
    rows = np.arange(hp)[:, None].astype(np.int32)
    d0 = y0p - rows  # delta per element
    d1 = y1p - rows

    def per_stripe(a, red):
        s = a.reshape(hp // TH, TH, wp // LANE, LANE)
        return red(red(s, axis=3), axis=1)  # (nstripes_y, ntiles_x)

    bands = per_stripe(y1p, np.max) // TH - per_stripe(y0p, np.min) // TH + 1
    tiles = per_stripe(x1p, np.max) // LANE - per_stripe(x0p, np.min) // LANE + 1
    deltas = per_stripe(d1, np.max) - per_stripe(d0, np.min) + 1
    return {
        "bands_mean": float(bands.mean()),
        "tiles_mean": float(tiles.mean()),
        "deltas_mean": float(deltas.mean()),
        "row_iters_band": float((bands * 8 * tiles).mean()),
        "row_iters_delta": float((deltas * tiles).mean()),
        "flow_std": float(flow.std()),
        "flow_absmax": float(np.abs(flow).max()),
    }


def main():
    import jax
    import jax.numpy as jnp

    from bench import _frames
    from rife_tpu.engine.session import RIFE
    from rife_tpu.ops.jax_ops import resize2d
    from rife_tpu.ops import frame

    session = RIFE("rife-v4.6", dtype="bfloat16")
    ex = session.executors["flownet"]
    in0, in1 = _frames(1)
    pad_h, pad_w = 1088, 1920
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
    for name, f in zip(["flow0", "flow1", "flow2", "flow3"], taps):
        f = np.asarray(f.astype(jnp.float32))
        print(name, "shape", f.shape, flush=True)
        # the graph warps with the tap upsampled to full res (x2 scale per
        # resize, values doubled), mirroring pipelines' per-level use
        fh, fw = f.shape[1], f.shape[2]
        scale = pad_h // fh
        if scale > 1:
            full = np.asarray(
                resize2d(jnp.asarray(f[..., :2]), pad_h, pad_w)
            ) * scale
        else:
            full = f[..., :2]
        s = stripe_stats(full[0], pad_h, pad_w)
        print(" ", {k: round(v, 2) for k, v in s.items()}, flush=True)


if __name__ == "__main__":
    main()
