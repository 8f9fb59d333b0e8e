from pcgcv2_tpu.ops import keys
from pcgcv2_tpu.ops.sparse import (
    SparseVoxels,
    apply_kernel_map,
    build,
    build_kernel_map,
    cat_feats,
    conv,
    conv_down,
    conv_up_generative,
    downsample_coords,
    prune,
    stencil_offsets,
    topk_mask,
)

__all__ = [
    "keys",
    "SparseVoxels",
    "apply_kernel_map",
    "build",
    "build_kernel_map",
    "cat_feats",
    "conv",
    "conv_down",
    "conv_up_generative",
    "downsample_coords",
    "prune",
    "stencil_offsets",
    "topk_mask",
]
