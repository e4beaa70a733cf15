"""``python -m rife_tpu`` — same CLI as ``python -m rife_tpu.cli``
(the reference ships a single binary; this is the module-level equivalent)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
