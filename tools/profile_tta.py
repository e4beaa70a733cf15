"""Where does the v4.6 -x (spatial TTA) step spend its time?

Times, on the TPU at B=1 1080p:
  1. plain step (reference point)
  2. full -x step
  3. view expansion + merge only (geometry ops)
  4. one pyramid-tap extraction per group (the 4-level loop, no averaging)
  5. flow_views_avg alone per level
  6. final _v4_out passes alone

Run: python -u tools/profile_tta.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sync(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(leaves[0].ravel()[0])


def timeit(fn, *args, iters=3):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from bench import _frames, H, W
    from rife_tpu.engine.session import RIFE
    from rife_tpu.engine import pipelines
    from rife_tpu.ops import frame

    session = RIFE("rife-v4.6", dtype="bfloat16", tta_mode=True)
    plain = RIFE("rife-v4.6", dtype="bfloat16")
    dev = session.device
    pad_h, pad_w = 1088, 1920
    in0, in1 = _frames(1)
    d0 = jax.device_put(jnp.asarray(in0), dev)
    d1 = jax.device_put(jnp.asarray(in1), dev)
    ts = jnp.full((1,), 0.5, jnp.float32)

    t = timeit(plain._get_step(1, H, W), plain.weights, d0, d1, ts)
    print(f"plain B=1: {t*1e3:8.1f} ms", flush=True)
    t = timeit(session._get_step(1, H, W), session.weights, d0, d1, ts)
    print(f"-x    B=1: {t*1e3:8.1f} ms", flush=True)

    cfg = session.cfg
    ex = session.executors["flownet"]
    Wt = session.weights

    # geometry only: expand + merge
    @jax.jit
    def geom(a0, a1):
        img0 = frame.preprocess(a0, pad_h, pad_w, cfg.jdtype)
        img1 = frame.preprocess(a1, pad_h, pad_w, cfg.jdtype)
        ga, gb = frame.expand_views8(img0)
        ha, hb = frame.expand_views8(img1)
        return frame.merge_views8_mean(ga + ha, gb + hb)

    print(f"expand+merge geometry: {timeit(geom, d0, d1)*1e3:8.1f} ms", flush=True)

    # pyramid taps per group (no averaging): extract flow0..flow3 with pins
    def taps_group(transposed):
        ph, pw = (pad_w, pad_h) if transposed else (pad_h, pad_w)

        @jax.jit
        def fn(Wt, a0, a1):
            img0 = frame.preprocess(a0, ph, pw, cfg.jdtype)
            img1 = frame.preprocess(a1, ph, pw, cfg.jdtype)
            tp = frame.timestep_plane(
                jnp.full((4,), 0.5, jnp.float32), 4, ph, pw, cfg.jdtype
            )
            i0 = jnp.repeat(img0, 4, axis=0)
            i1 = jnp.repeat(img1, 4, axis=0)
            pins = {}
            for tap in pipelines.V4_TAPS:
                f = pipelines._v4_flow_pyramid(ex, cfg, Wt, i0, i1, tp, pins)
                pins[tap] = f
            out = pipelines._v4_out(ex, cfg, Wt, i0, i1, tp, pins)
            return out

        a0 = d0 if not transposed else jnp.swapaxes(d0, 1, 2)
        a1 = d1 if not transposed else jnp.swapaxes(d1, 1, 2)
        return timeit(fn, Wt, a0, a1)

    print(f"4 taps + out, canonical group (B=4): {taps_group(False)*1e3:8.1f} ms",
          flush=True)
    print(f"4 taps + out, transposed group (B=4): {taps_group(True)*1e3:8.1f} ms",
          flush=True)

    # flow_views_avg alone at each level resolution
    for lvl, (fh, fw) in enumerate([(136, 240), (272, 480), (544, 960),
                                    (1088, 1920)]):
        ga = jnp.zeros((1, 4, fh, fw, 6), cfg.jdtype)
        gb = jnp.zeros((1, 4, fw, fh, 6), cfg.jdtype)

        @jax.jit
        def avg(ga, gb):
            return frame.flow_views_avg(ga, gb, n_pairs=2, has_mask=True)

        print(f"flow_views_avg level {lvl} ({fh}x{fw}): "
              f"{timeit(avg, ga, gb)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
