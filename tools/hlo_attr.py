"""Dump the compiled HLO of the v4.6 fused step and print the big ops.

Compiles the exact bench.py step (B from argv) on the TPU, writes the
optimized HLO text to /tmp/v46_hlo.txt, and prints every fusion/copy/
custom-call whose name matches the hot rows of tools/profile_step.py so the
trace's opaque names (copy.773, compare_select_fusion.5, ...) can be read.

Run: python -u tools/hlo_attr.py [B] [name-substr ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from rife_tpu.engine.session import RIFE

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    names = sys.argv[2:]
    H, W = 1080, 1920

    session = RIFE("rife-v4.6", dtype="bfloat16")
    from rife_tpu.engine.session import pad_to

    ph, pw = pad_to(H), pad_to(W)
    step = session.build_step_fn(ph, pw, warp_variant="auto")
    d0 = jnp.zeros((B, H, W, 3), jnp.uint8)
    d1 = jnp.zeros((B, H, W, 3), jnp.uint8)
    ts = jnp.full((B,), 0.5, jnp.float32)
    lowered = jax.jit(step).lower(session.weights, d0, d1, ts)
    compiled = lowered.compile()
    txt = compiled.as_text()
    Path("/tmp/v46_hlo.txt").write_text(txt)
    print(f"HLO written: /tmp/v46_hlo.txt ({len(txt.splitlines())} lines)")

    if not names:
        return
    lines = txt.splitlines()
    for want in names:
        pat = re.compile(rf"%?{re.escape(want)}\b")
        for i, ln in enumerate(lines):
            if pat.search(ln) and ("= " in ln):
                print(f"\n=== {want} @ line {i} ===")
                print(ln.strip()[:600])


if __name__ == "__main__":
    main()
