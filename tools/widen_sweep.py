"""Wide-N conv packing experiment (real chip).

MXU cost model: conv time ~ M * K * ceil(N/128) where M = B*H*W rows,
K = kh*kw*Cin contraction, N = Cout lanes.  The v4 IFBlock bodies run
3x3 stride-1 convs at Cout in {32, 48, 64} — 1/4 to 1/2 lane occupancy.

Packing P adjacent OUTPUT pixels into the lane dim (kernel 3x3 ->
3x(3+P-1), stride (1,P), Cout -> P*Cout, zero-filled weight taps; the
INPUT tensor is untouched) trades K: 9Cin -> 3(P+2)Cin for an M/P row
count, i.e. model speedup 9P/(3(P+2)) = 1.5x at P=2, 2.0x at P=4 —
IF time is lane-bound and the extra zero taps are free.

This tool measures it: baseline vs packed P=2/P=4, with a correctness
check (same float terms + exact zeros, so allclose at bf16 tolerances).

Run: python -u tools/widen_sweep.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print("device:", dev.platform)

    def sync(x):
        return np.asarray(x.ravel()[0])

    def conv(x, w, stride_w=1, pad_w=(1, 1)):
        return lax.conv_general_dilated(
            x, w, (1, stride_w), [(1, 1), pad_w],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def pack_weights(k, p):
        """(3,3,Cin,Co) -> (3,3+p-1,Cin,p*Co): slot j holds the kernel
        shifted j taps right; output (y, p*x'+j) = conv at (y, p*x'+j)."""
        kh, kw, ci, co = k.shape
        out = np.zeros((kh, kw + p - 1, ci, p * co), k.dtype)
        kn = np.asarray(k)
        for j in range(p):
            out[:, j:j + kw, :, j * co:(j + 1) * co] = kn
        return jnp.asarray(out)

    rng = np.random.default_rng(0)
    B = 24
    for h, w in ((540, 960), (270, 480)):
        for c in (32, 48, 64):
            x = jnp.asarray(rng.normal(size=(B, h, w, c)), jnp.bfloat16)
            k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)

            base = jax.jit(lambda x, k: conv(x, k))

            def packed_fn(p):
                kp = pack_weights(k, p)

                @jax.jit
                def run(x, kp=kp, p=p):
                    y = conv(x, kp, stride_w=p, pad_w=(1, p))
                    b, ho, wo, pc = y.shape
                    return y.reshape(b, ho, wo, p, c).reshape(
                        b, ho, wo * p, c
                    )[:, :, :w, :]

                return run

            ref = base(x, k)
            rows = [("base", lambda x, k=k: base(x, k))]
            for p in (2, 4):
                fn = packed_fn(p)
                got = fn(x)
                err = float(
                    jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
                rows.append((f"P={p} (err {err:.1e})", fn))

            for label, fn in rows:
                sync(fn(x))
                iters = 10
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = fn(x)
                sync(out)
                dt = (time.perf_counter() - t0) / iters
                fl = B * h * w * 9 * c * c * 2
                print(
                    f"{h}x{w} C={c:3d} {label:16s}: {dt*1e3:7.3f} ms "
                    f"{fl/dt/1e12:6.1f} TF/s", flush=True,
                )
        print()


if __name__ == "__main__":
    main()
