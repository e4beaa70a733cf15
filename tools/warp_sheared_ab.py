"""A/B: band-tall pair kernels vs the SHEARED (dy-walk) pair kernels.

Real frames + calibrated-smooth synthetic flows at the headline workload's
statistics, like tools/warp_pair_ab.py — but everything bulky is
synthesized ON DEVICE (the dev tunnel moves ~MB/s; only the two base
1080p frames ever cross it, ~12 MB total).  Checks exactness (sheared vs
tall, pair and render forms; diffs reduced on device, scalars pulled) and
times both, plus an adversarial iid-flow row (the sheared kernel must
stay correct there — it chunk-walks, so it degrades gracefully instead
of breaking).

The RIFE_TPU_WARP_SHEARED env knob is read at trace time, so each variant
is traced under its own environ setting.

Run: python -u tools/warp_sheared_ab.py [B] [NB]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sync(x):
    return np.asarray(x.ravel()[0])


def timeit(fn, iters=10, warm=2):
    for _ in range(warm):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rife_tpu.ops.warp_pallas import warp_pallas_pair

    # bypass warp_pallas_pair's own jit cache: the env knob is read at
    # trace time, and the inner cache would otherwise serve the first
    # variant's trace to the second
    warp_pair_raw = warp_pallas_pair.__wrapped__

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    NB = sys.argv[2] if len(sys.argv) > 2 else "4"
    H, W = 1088, 1920
    os.environ["RIFE_TPU_WARP_NB"] = NB

    def load(path):
        with Image.open(path) as im:
            return np.asarray(
                im.convert("RGB").resize((W, H), Image.BILINEAR), np.uint8)

    # only the (H,W,3) u8 bases cross the tunnel; tile/flow-synthesis on
    # device
    base0 = jnp.asarray(load("/root/reference/images/0.png"))
    base1 = jnp.asarray(load("/root/reference/images/1.png"))

    @jax.jit
    def make_operands(b0, b1):
        # bases as ARGUMENTS: closure capture would embed them as MLIR
        # constants, which round-trips them device->host over the slow
        # tunnel at lowering time
        img_a = jnp.tile(b0[None].astype(jnp.bfloat16) / 255.0,
                         (B, 1, 1, 1))
        img_b = jnp.tile(b1[None].astype(jnp.bfloat16) / 255.0,
                         (B, 1, 1, 1))
        yy = jnp.linspace(0.0, 4 * jnp.pi, H)[:, None]
        xx = jnp.linspace(0.0, 4 * jnp.pi, W)[None, :]
        z = jnp.zeros((H, W), jnp.float32)
        fa = jnp.stack([3.0 * jnp.sin(yy + 0.5 * xx) + z,
                        2.0 * jnp.cos(xx) + z], -1)
        fb = jnp.stack([-2.5 * jnp.cos(0.7 * yy) + z,
                        3.5 * jnp.sin(0.6 * xx + yy) + z], -1)
        flow_a = jnp.tile(fa[None].astype(jnp.bfloat16), (B, 1, 1, 1))
        flow_b = jnp.tile(fb[None].astype(jnp.bfloat16), (B, 1, 1, 1))
        mask = jnp.tile(
            (0.5 + 0.4 * jnp.sin(yy + xx)).astype(jnp.bfloat16)[None],
            (B, 1, 1))
        return img_a, img_b, flow_a, flow_b, mask

    @jax.jit
    def make_iid():
        # spatially-white iid flow ~ U(-24, 24): the adversarial case
        key = jax.random.PRNGKey(7)
        fiid = jax.random.uniform(key, (H, W, 2), jnp.float32, -24.0, 24.0)
        return jnp.tile(fiid[None].astype(jnp.bfloat16), (B, 1, 1, 1))

    img_a, img_b, flow_a, flow_b, mask = jax.block_until_ready(
        make_operands(base0, base1))
    print("operands on device", flush=True)

    def trace(sheared: bool, flows, with_rend: bool = True):
        os.environ["RIFE_TPU_WARP_SHEARED"] = "1" if sheared else "0"
        fa_, fb_ = flows
        # operands as jit ARGUMENTS, not closures: closure capture embeds
        # ~1.5 GB of device constants into each executable and the 1-core
        # host then spends tens of minutes in XLA constant handling
        pair_f = jax.jit(lambda ia, fa, ib, fb: warp_pair_raw(
            ia, fa, ib, fb))
        rend_f = jax.jit(lambda ia, fa, ib, fb, m: warp_pair_raw(
            ia, fa, ib, fb, m, blend=True))
        pair = lambda: pair_f(img_a, fa_, img_b, fb_)  # noqa: E731
        rend = lambda: rend_f(img_a, fa_, img_b, fb_, mask)  # noqa: E731
        t0 = time.perf_counter()
        try:
            sync(pair()[0])  # force trace under this environ
        except Exception as e:
            print("PAIR TRACE FAILED:", str(e)[:4000], flush=True)
            raise
        print(f"  traced pair sheared={sheared} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if with_rend:
            t0 = time.perf_counter()
            sync(rend())
            print(f"  traced rend sheared={sheared} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        return pair, rend

    pair_t, rend_t = trace(False, (flow_a, flow_b))
    pair_s, rend_s = trace(True, (flow_a, flow_b))

    def dmax(a, b):  # device-side diff, scalar readback only (slow tunnel)
        return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b.astype(jnp.float32))))

    (ta, tb) = pair_t()
    (sa, sb) = pair_s()
    print(f"pair exactness (sheared vs tall): max|d| a={dmax(ta, sa):.3e} "
          f"b={dmax(tb, sb):.3e}", flush=True)
    del ta, tb, sa, sb  # ~1.5 GB at B=30 — free before timing
    print(f"render exactness: max|d|={dmax(rend_t(), rend_s()):.3e}",
          flush=True)

    t_pt = timeit(lambda: pair_t()[1])
    t_ps = timeit(lambda: pair_s()[1])
    print(f"smooth pair:   tall {t_pt:8.2f} ms   sheared {t_ps:8.2f} ms  "
          f"({t_pt / t_ps:.2f}x)", flush=True)
    t_rt = timeit(lambda: rend_t())
    t_rs = timeit(lambda: rend_s())
    print(f"smooth render: tall {t_rt:8.2f} ms   sheared {t_rs:8.2f} ms  "
          f"({t_rt / t_rs:.2f}x)", flush=True)

    # adversarial iid flow: correctness + graceful degradation
    flow_iid = jax.block_until_ready(make_iid())
    pair_ti, _ = trace(False, (flow_iid, flow_iid), with_rend=False)
    pair_si, _ = trace(True, (flow_iid, flow_iid), with_rend=False)
    (tia, _unused) = pair_ti()
    (sia, _unused2) = pair_si()
    print(f"iid exactness: max|d|={dmax(tia, sia):.3e}", flush=True)
    t_ti = timeit(lambda: pair_ti()[1], iters=2, warm=1)
    t_si = timeit(lambda: pair_si()[1], iters=2, warm=1)
    print(f"iid pair:      tall {t_ti:8.2f} ms   sheared {t_si:8.2f} ms  "
          f"({t_ti / t_si:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
