"""pcgcv2_tpu — a TPU-native framework for learned point-cloud geometry compression.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NJUVISION/PCGCv2
(reference: /root/reference — PyTorch + MinkowskiEngine/CUDA).  The sparse-voxel
compute core replaces MinkowskiEngine's GPU hash-map/gather-GEMM runtime with
sorted raveled-key coordinate sets, on-device kernel maps (searchsorted over
fixed 3^3 / 2^3 offset stencils), MXU-friendly gather-GEMM convolutions, and
bucketed static shapes so everything runs under `jax.jit`.

Subpackages
-----------
ops       sparse voxel tensor + kernel maps + convolutions + pruning (the
          MinkowskiEngine replacement, ref usage: autoencoder.py, data_utils.py)
models    Encoder/Decoder/InceptionResNet/PCCModel + factorized entropy model
          (ref: autoencoder.py, pcc_model.py, entropy_model.py)
codec     bitstream pipeline: rANS feature coder, octree/G-PCC coordinate coder
          (ref: coder.py, gpcc.py; torchac replacement)
data      PLY/H5 I/O, voxelization, datasets, mesh sampling
          (ref: data_utils.py, data_loader.py, generate_dataset.py)
train     RD loss, trainer, checkpoints (ref: loss.py, trainer.py, train.py)
eval      D1/D2 distortion metrics + pc_error bridge, rate sweep (ref:
          pc_error.py, test.py)
parallel  device-mesh sharding: data-parallel training over ICI via shard_map
          (the reference is single-GPU; this is new capability)
"""

import jax

# Coordinate keys are mixed-radix raveled int64 scalars (14 bits/axis * 3 axes
# + batch), which requires 64-bit integer support.  Floating point stays
# explicitly float32/bfloat16 everywhere (TPUs have no f64); every array
# constructor in this package passes an explicit dtype.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from pcgcv2_tpu.ops.sparse import SparseVoxels  # noqa: E402,F401
