#!/usr/bin/env python3
"""Compatibility shim: `python show_modalities.py ...` (the reference
tool's entry point) delegates to the framework's dataset tooling,
`python -m vae_cyclegan_tpu.data.tools show` — same flags.
"""

import sys

from vae_cyclegan_tpu.data.tools import main

if __name__ == "__main__":
    raise SystemExit(main(["show", *sys.argv[1:]]))
