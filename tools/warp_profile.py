"""Profile one standalone u8 warp call: per-op attribution (pallas kernel
vs driver-side XLA packing/pad/reduction ops) via the JAX profiler.

Run: python -u tools/warp_profile.py [variant] [B]
"""

from __future__ import annotations

import collections
import functools
import glob
import gzip
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.ops.warp_pallas import warp_pallas

    var = sys.argv[1] if len(sys.argv) > 1 else "sdelta"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    H, Wd = 1088, 1920

    yy = np.linspace(0, 6.28, H, dtype=np.float32)[:, None]
    xx = np.linspace(0, 6.28, Wd, dtype=np.float32)[None, :]
    flow = np.broadcast_to(np.stack(
        [4.0 * np.sin(3 * yy + 1.7 * xx),
         3.0 * np.cos(2.2 * yy - 1.1 * xx)], -1)[None], (B, H, Wd, 2)).copy()
    img = (np.random.default_rng(0)
           .integers(0, 256, (B, H, Wd, 3)).astype(np.float32) / 255.0)
    di = jnp.asarray(img, jnp.bfloat16)
    df = jnp.asarray(flow)

    g = jax.jit(functools.partial(
        warp_pallas, u8_origin=True, u8_variant=var))
    out = g(di, df)
    np.asarray(out[0, 0, 0, 0])

    tdir = "/tmp/warp_trace"
    with jax.profiler.trace(tdir):
        for _ in range(3):
            out = g(di, df)
        np.asarray(out[0, 0, 0, 0])

    time.sleep(2)
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    paths.sort(key=lambda p: Path(p).stat().st_mtime)
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    agg = collections.defaultdict(lambda: [0, 0])
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            agg[e["name"]][0] += e["dur"]
            agg[e["name"]][1] += 1
    skip = ("asarray", "__array__", "wrapper", "_value", "trace",
            "stop_trace", "__exit__", "jit_")
    rows = [(d, c, n) for n, (d, c) in agg.items()
            if not any(s in n for s in skip)]
    for d, c, n in sorted(rows, reverse=True)[:25]:
        print(f"{d/3000:9.3f} ms  x{c:3d}  {n[:90]}", flush=True)


if __name__ == "__main__":
    main()
