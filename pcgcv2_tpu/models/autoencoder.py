"""Three-scale sparse autoencoder (ref /root/reference/autoencoder.py).

Encoder: per scale [3^3 conv -> 2x down-conv -> 3 InceptionResNet blocks],
channels (1,16,32,64,32,8), returning the bottleneck plus the two
intermediate coordinate sets used as pruning ground truth
(ref Encoder.forward, autoencoder.py:138-147).

Decoder: per scale [generative 2x up-conv -> 3^3 conv -> 3 IRN blocks ->
1-channel occupancy head -> top-k prune], channels (8,64,32,16)
(ref Decoder.forward, autoencoder.py:251-273).  During training the prune
keeps top-k UNION ground-truth voxels (autoencoder.py:239-249) so gradients
reach both false positives and false negatives.

TPU restructuring vs the reference: one kernel map per coordinate set,
shared by every stride-1 conv at that scale (ME rebuilds these in its
coordinate manager); pruning/top-k run fully on device with static shapes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pcgcv2_tpu import ops
from pcgcv2_tpu.models.layers import (
    InceptionResNet,
    SpConv1,
    SpConv3,
    SpConvDown,
    SpGenUp,
    relu,
)
from pcgcv2_tpu.ops.sparse import SparseVoxels


class Encoder(nn.Module):
    channels: Sequence[int] = (1, 16, 32, 64, 32, 8)
    caps: Tuple[int, int, int] = (0, 0, 0)  # capacities after each down-conv
    blocks: int = 3

    @nn.compact
    def __call__(self, x: SparseVoxels):
        ch = self.channels
        outs = []
        out = x
        for s in range(3):
            km_in = ops.build_kernel_map(
                out, ops.stencil_offsets(3, out.stride)
            )
            out = SpConv3(ch[s + 1], name=f"conv{s}")(out, km_in)
            out = SpConvDown(ch[s + 2], self.caps[s], name=f"down{s}")(relu(out))
            out = relu(out)
            km = ops.build_kernel_map(out, ops.stencil_offsets(3, out.stride))
            for i in range(self.blocks):
                out = InceptionResNet(ch[s + 2], name=f"block{s}_{i}")(out, km)
            outs.append((out, km))
        out2, km2 = outs[2]
        out2 = SpConv3(ch[5], name="conv3")(out2, km2)
        # coarse -> fine, matching the reference's [out2, out1, out0]
        return out2, outs[1][0], outs[0][0]


class Decoder(nn.Module):
    channels: Sequence[int] = (8, 64, 32, 16)
    blocks: int = 3
    num_batches: int = 1

    @nn.compact
    def __call__(
        self,
        y: SparseVoxels,
        nums_list: Sequence[jnp.ndarray],
        gt_keys_list: Optional[Sequence[jnp.ndarray]],
        prune_caps: Tuple[int, int, int],
        training: bool,
    ):
        """Returns (out_cls_list, out).

        out_cls_list[i] is the *pre-prune* candidate tensor of stage i with
        1-channel occupancy logits as features — exactly what the loss needs
        (ref pcc_model.py:39-45, loss.py:7-15).
        """
        ch = self.channels
        out = y
        out_cls_list: List[SparseVoxels] = []
        for s in range(3):
            out = SpGenUp(ch[s + 1], name=f"up{s}")(out)
            out = relu(out)
            km = ops.build_kernel_map(out, ops.stencil_offsets(3, out.stride))
            out = relu(SpConv3(ch[s + 1], name=f"conv{s}")(out, km))
            for i in range(self.blocks):
                out = InceptionResNet(ch[s + 1], name=f"block{s}_{i}")(out, km)
            cls = SpConv3(1, name=f"conv{s}_cls")(out, km)
            out_cls_list.append(cls)
            logits = cls.feats[:, 0]
            keep = ops.topk_mask(out, logits, nums_list[s], self.num_batches)
            if training:
                assert gt_keys_list is not None
                keep = keep | ops.keys.isin(gt_keys_list[s], out.keys)
            out = ops.prune(out, keep, prune_caps[s])
        return out_cls_list, out
