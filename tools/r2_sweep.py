"""Round-2 throughput sweep: donation + batch knee.

Measures the fused v4.6 1080p step at several batch sizes, with and without
input-buffer donation (jax.jit donate_argnums on the u8 frames), to find the
HBM knee.  Run on the TPU: python -u tools/r2_sweep.py [B ...]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _frames, H, W
    from rife_tpu.engine.session import RIFE, pad_to

    dev = jax.devices()[0]
    print("device:", dev.platform, flush=True)
    session = RIFE("rife-v4.6", dtype="bfloat16")

    batches = [int(a) for a in sys.argv[1:]] or [24, 28, 32]

    def sync(x):
        return np.asarray(x[0, 0, 0, 0])

    for donate in (False, True):
        for b in batches:
            try:
                raw = session.build_step_fn(pad_to(H), pad_to(W))
                step = jax.jit(
                    raw, donate_argnums=(1, 2) if donate else ()
                )
                in0, in1 = _frames(b)
                ts = jax.device_put(
                    jnp.full((b,), 0.5, jnp.float32), dev
                )
                iters = 4
                # donation consumes the buffers: re-put per iter (uploads are
                # fast, 1.5GB/s; and XLA reuses the donated pages)
                t_total = 0.0
                out = None
                d0 = jax.device_put(jnp.asarray(in0), dev)
                d1 = jax.device_put(jnp.asarray(in1), dev)
                out = step(session.weights, d0, d1, ts)
                sync(out)  # compile+warm (d0/d1 now consumed if donate)
                t0 = time.perf_counter()
                for _ in range(iters):
                    if donate:
                        d0 = jax.device_put(jnp.asarray(in0), dev)
                        d1 = jax.device_put(jnp.asarray(in1), dev)
                    out = step(session.weights, d0, d1, ts)
                sync(out)
                t_total = time.perf_counter() - t0
                dt = t_total / iters
                print(
                    f"donate={donate} B={b}: {dt*1e3:8.1f} ms "
                    f"({b/dt:6.2f} fps)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"donate={donate} B={b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
