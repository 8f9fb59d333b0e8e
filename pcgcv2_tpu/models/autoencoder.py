"""Three-scale sparse autoencoder on the dense-block backend
(ref /root/reference/autoencoder.py).

Encoder: per scale [3^3 conv -> 2x down-conv -> 3 InceptionResNet blocks],
channels (1,16,32,64,32,8), returning the bottleneck plus the two
intermediate occupancy grids used as pruning ground truth
(ref Encoder.forward, autoencoder.py:138-147).

Decoder: per scale [generative 2x up-conv -> 3^3 conv -> 3 IRN blocks ->
1-channel occupancy head -> top-k prune -> drop empty blocks], channels
(8,64,32,16) (ref Decoder.forward, autoencoder.py:251-273).  During training
the prune keeps top-k UNION ground-truth voxels (autoencoder.py:239-249) so
gradients reach both false positives and false negatives.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pcgcv2_tpu.config import BlockPlan
from pcgcv2_tpu.models.layers import (
    BConv3,
    BConvDown,
    BGenUp,
    BInceptionResNet,
    relu,
)
from pcgcv2_tpu.ops import blocks as B
from pcgcv2_tpu.ops.blocks import BlockGrid

# NOTE on remat granularity: training wraps whole encoder scales and
# decoder stages in nn.remat (see __call__ below) — that one checkpoint
# level already discards every interior activation (halo gathers, IRN
# intermediates) from the saved set.  An additional per-IRN-block remat
# inside it is memory-neutral but NESTS jax.checkpoint, which made the
# backward compile pathological (>17 min for the tiny test model on
# XLA:CPU, +70% on the TPU tunnel); the blocks are therefore plain.


class Encoder(nn.Module):
    channels: Sequence[int] = (1, 16, 32, 64, 32, 8)
    plan: BlockPlan = BlockPlan(res=128, nb=(2048, 1024, 512, 256))
    blocks: int = 3
    remat: bool = True

    def _scale(self, s: int, out: BlockGrid) -> BlockGrid:
        """One encoder scale: 3^3 conv -> 2x down -> IRN stack."""
        ch = self.channels
        nbrs_in = B.neighbor_rows(out)
        out = BConv3(ch[s + 1], name=f"conv{s}")(out, nbrs_in)
        out = BConvDown(
            ch[s + 2], self.plan.nb[s + 1], name=f"down{s}"
        )(relu(out))
        out = relu(out)
        nbrs = B.neighbor_rows(out)
        for i in range(self.blocks):
            out = BInceptionResNet(
                ch[s + 2], name=f"block{s}_{i}"
            )(out, nbrs)
        return out

    @nn.compact
    def __call__(self, x: BlockGrid, training: bool = False):
        # Whole-scale remat IN TRAINING ONLY: only the three scale outputs
        # are saved for the backward pass — each scale's halo gathers and
        # conv activations (the [nb, 18^3-halo, C] temps that put the
        # vox10-class training step at 17.1 GiB, over one v5e's 14.9 GiB
        # HBM) are recomputed instead.  Inference paths (codec encode_fn)
        # skip the remat wrapper so their HLO — and the persistent compile
        # cache entries for it — are unchanged.
        scale = (nn.remat(Encoder._scale, static_argnums=(1,))
                 if training and self.remat else Encoder._scale)
        outs: List[BlockGrid] = []
        out = x
        for s in range(3):
            out = scale(self, s, out)
            outs.append(out)
        out2 = BConv3(self.channels[5], name="conv3")(
            outs[2], B.neighbor_rows(outs[2])
        )
        # coarse -> fine, matching the reference's [out2, out1, out0]
        return out2, outs[1], outs[0]


class Decoder(nn.Module):
    channels: Sequence[int] = (8, 64, 32, 16)
    plan: BlockPlan = BlockPlan(res=128, nb=(2048, 1024, 512, 256))
    blocks: int = 3
    remat: bool = True

    def setup(self):
        ch = self.channels
        for s in range(3):
            setattr(self, f"up{s}", BGenUp(ch[s + 1], self.plan.up_cap(s)))
            setattr(self, f"conv{s}", BConv3(ch[s + 1]))
            for i in range(self.blocks):
                setattr(
                    self, f"block{s}_{i}", BInceptionResNet(ch[s + 1])
                )
            setattr(self, f"conv{s}_cls", BConv3(1))

    def stage(
        self, s: int, bg: BlockGrid, up_cap: Optional[int] = None
    ) -> Tuple[BlockGrid, BlockGrid]:
        """One decoder scale on an arbitrary (sub-)grid: generative up-conv
        -> 3^3 conv -> IRN stack -> occupancy head.  Returns (features,
        cls-logits) on the pre-prune candidate grid.  Public so the
        streamed / spatially-sharded decoders can run a stage on coordinate
        slabs (the stage's receptive field is 8 voxels — one halo block)."""
        out = relu(getattr(self, f"up{s}")(bg, out_cap=up_cap))
        nbrs = B.neighbor_rows(out)
        out = relu(getattr(self, f"conv{s}")(out, nbrs))
        for i in range(self.blocks):
            out = getattr(self, f"block{s}_{i}")(out, nbrs)
        cls = getattr(self, f"conv{s}_cls")(out, nbrs)
        return out, cls

    def __call__(
        self,
        y: BlockGrid,
        nums_list: Sequence[jnp.ndarray],
        gt_list: Optional[Sequence[BlockGrid]],
        training: bool,
    ) -> Tuple[List[BlockGrid], BlockGrid]:
        """Returns (out_cls_list, out).

        out_cls_list[i] is the *pre-prune* candidate grid of stage i with
        1-channel occupancy logits as features — exactly what the loss needs
        (ref pcc_model.py:39-45, loss.py:7-15).
        """
        # Remat each decoder stage in training (cf. Encoder.__call__):
        # saves only the pruned inter-stage grids; the candidate-grid halos
        # and IRN activations are recomputed in backward.  Inference keeps
        # the un-wrapped stages (identical HLO to pre-remat builds).
        stage = (nn.remat(Decoder.stage, static_argnums=(1, 3))
                 if training and self.remat else Decoder.stage)
        out = y
        out_cls_list: List[BlockGrid] = []
        for s in range(3):
            out, cls = stage(self, s, out, None)
            out_cls_list.append(cls)
            logits = cls.feats[:, :, 0]
            keep = B.topk_mask(out, logits, nums_list[s])
            if training:
                assert gt_list is not None
                keep = keep | B.isin(out, gt_list[s])
            out = B.compact(B.prune(out, keep), self.plan.dec_nb[s])
        return out_cls_list, out
