#!/usr/bin/env python3
"""Compatibility shim: `python download_dataset_sample.py ...` (the
reference tool's entry point) delegates to the framework's dataset tooling,
`python -m vae_cyclegan_tpu.data.tools sample` — same flags.
"""

import sys

from vae_cyclegan_tpu.data.tools import main

if __name__ == "__main__":
    raise SystemExit(main(["sample", *sys.argv[1:]]))
