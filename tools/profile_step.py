"""Per-op trace attribution of a model's fused step (default executors).

Run: python -u tools/profile_v23.py [B] [tta: 0/1] [model] [HxW]
"""

from __future__ import annotations

import collections
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
    from PIL import Image

    from rife_tpu.engine.session import RIFE

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tta = len(sys.argv) > 2 and sys.argv[2] == "1"
    model = sys.argv[3] if len(sys.argv) > 3 else "rife-v2.3"
    H, Wd = 1080, 1920
    if len(sys.argv) > 4:
        H, Wd = (int(v) for v in sys.argv[4].split("x"))

    def load(path):
        with Image.open(path) as im:
            return np.asarray(
                im.convert("RGB").resize((Wd, H), Image.BILINEAR), np.uint8)

    f0 = np.broadcast_to(load("/root/reference/images/0.png"),
                         (B, H, Wd, 3)).copy()
    f1 = np.broadcast_to(load("/root/reference/images/1.png"),
                         (B, H, Wd, 3)).copy()
    ts = np.full((B,), 0.5, np.float32)

    session = RIFE(model, dtype="bfloat16", tta_mode=tta)
    out = session.process_batch_device(f0, f1, ts)
    np.asarray(out[0, 0, 0, 0])

    tdir = "/tmp/v23_trace"
    with jax.profiler.trace(tdir):
        for _ in range(3):
            out = session.process_batch_device(f0, f1, ts)
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
            "stop_trace", "__exit__", "jit_", "device_put", "copy.py",
            "array.py")
    rows = [(d, c, n) for n, (d, c) in agg.items()
            if not any(s in n for s in skip)]
    total = sum(d for d, _, _ in rows)
    print(f"total attributed: {total/3000:.1f} ms/step over 3 steps")
    for d, c, n in sorted(rows, reverse=True)[:35]:
        print(f"{d/3000:9.3f} ms  x{c//3:3d}  {n[:90]}", flush=True)
    import re as _re
    cat = collections.defaultdict(float)
    for d, c, n in rows:
        cat[_re.split(r"[.\d]", n)[0]] += d
    print("--- by category ---")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v/3000:9.2f} ms  {k}", flush=True)


if __name__ == "__main__":
    main()
