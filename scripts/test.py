#!/usr/bin/env python
"""Thin launcher for pcgcv2_tpu.cli.test (run from the repo root)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pcgcv2_tpu.cli.test import main

if __name__ == "__main__":
    main()
