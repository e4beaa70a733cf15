"""Real-weight parity harness: PSNR of this framework's output vs a
reference PNG produced by the reference binary.

    python tools/parity.py <modeldir> <in0> <in1> <ref.png> [options]
        -s t     timestep (default 0.5)
        -x / -z / -u   TTA / temporal TTA / UHD modes
        -g -1    run on the JAX CPU backend (default: first device)

Prints one line: ``PSNR <value> dB  (target > 50)`` and exits 0 when the
model ran with real weights, 2 when any net fell back to synthetic weights
(PSNR vs the reference PNG is then meaningless — the mount is missing the
.bin files; see /root/reference/.MISSING_LARGE_BLOBS).

Reference goldens to use when the full model zoo is mounted:
``/root/reference/images/{0,1}.png`` -> ``out.png`` (rife-anime) and
``outx.png`` (rife-anime -x), per /root/reference/README.md:152-173.
"""

from __future__ import annotations

import getopt
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def psnr(a, b) -> float:
    import numpy as np

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    opts, pos = getopt.gnu_getopt(argv, "s:g:xzu")
    if len(pos) != 4:
        print(__doc__, file=sys.stderr)
        return 255
    modeldir, in0_path, in1_path, ref_path = pos
    timestep, gpuid = 0.5, 0
    tta = ttaz = uhd = False
    for o, v in opts:
        if o == "-s":
            timestep = float(v)
        elif o == "-g":
            gpuid = int(v)
        elif o == "-x":
            tta = True
        elif o == "-z":
            ttaz = True
        elif o == "-u":
            uhd = True

    import jax

    from rife_tpu.engine.session import RIFE
    from rife_tpu.io.image import decode_image

    device = jax.devices("cpu")[0] if gpuid == -1 else None
    session = RIFE(
        modeldir, tta_mode=tta, tta_temporal_mode=ttaz, uhd_mode=uhd,
        device=device,
    )
    in0 = decode_image(in0_path)
    in1 = decode_image(in1_path)
    ref = decode_image(ref_path)
    out = session.process(in0, in1, timestep)
    if out.shape != ref.shape:
        print(f"shape mismatch: out {out.shape} vs ref {ref.shape}",
              file=sys.stderr)
        return 1
    value = psnr(out, ref)
    synthetic = session.model.any_synthetic
    tag = "  [SYNTHETIC WEIGHTS — not a parity result]" if synthetic else ""
    print(f"PSNR {value:.2f} dB  (target > 50){tag}")
    return 2 if synthetic else 0


if __name__ == "__main__":
    sys.exit(main())
