"""Shared tiny model configuration for the CPU test suite.

The real ModelConfig (channels (1,16,32,64,32,8), 3 IRN blocks/scale) is
~40 sparse convs; one XLA:CPU compile of its training step takes minutes on
a single-core host.  Tests exercise code paths, not capacity, so they share
this narrow config (same topology: 3 scales, IRN blocks, cls heads, entropy
bottleneck on 8 channels) — compiles drop by ~10x, and sharing ONE config
across test modules lets the persistent compilation cache dedupe repeated
shapes.
"""

from pcgcv2_tpu.config import ModelConfig

TINY_MODEL = ModelConfig(
    enc_channels=(1, 8, 16, 16, 16, 8),
    dec_channels=(8, 16, 16, 8),
    blocks_per_scale=1,
    # remat is a memory knob with identical semantics (jax.checkpoint);
    # leaving it on multiplies the XLA:CPU backward compile severalfold
    # for zero test value (the TPU training runs cover the remat path)
    remat_training=False,
)
