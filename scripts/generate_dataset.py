#!/usr/bin/env python
"""Thin launcher for pcgcv2_tpu.cli.generate_dataset (run from the repo root)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pcgcv2_tpu.cli.generate_dataset import main

if __name__ == "__main__":
    main()
