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

# NOTE on dtypes: the production compute path (ops.blocks + models + codec)
# is pure int32/float32 — block keys fit int32 under the MAX_TABLE_CELLS
# guard.  jax_enable_x64 must stay OFF: with it on, flax parameter inits
# default to float64, which TPUs emulate as float32 pairs (~10x compile and
# runtime cost; observed as a 22.5 GB paired-f32 broadcast OOM at vox10
# scale).  Only the sparse test oracle (ops.sparse / ops.keys) needs int64
# raveled keys; tests/conftest.py enables x64 for the CPU-only test suite.

__version__ = "0.1.0"
