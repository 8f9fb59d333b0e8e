"""PCCModel — encoder + factorized entropy bottleneck + decoder
(ref /root/reference/pcc_model.py), on the dense-block backend.

The model consumes raw padded voxel rows (coords [N,4], valid [N]) — no
pre-sorting is required; `ops.blocks.blockify` builds the block structure on
device.  The forward pass returns the same payload as the reference
(pcc_model.py:41-45): per-scale pre-prune occupancy logits, the quantized
prior, feature likelihoods (dense, mask-aware), and the ground-truth
occupancy pyramid.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcgcv2_tpu.config import BlockPlan, ModelConfig
from pcgcv2_tpu.models.autoencoder import Decoder, Encoder
from pcgcv2_tpu.models.entropy import EntropyBottleneck
from pcgcv2_tpu.ops import blocks as B
from pcgcv2_tpu.ops.blocks import BlockGrid


class PCCModel(nn.Module):
    config: ModelConfig = ModelConfig()
    plan: BlockPlan = BlockPlan(res=128, nb=(2048, 1024, 512, 256))
    num_batches: int = 1

    def setup(self):
        self.encoder = Encoder(
            channels=self.config.enc_channels,
            plan=self.plan,
            blocks=self.config.blocks_per_scale,
            remat=self.config.remat_training,
        )
        self.decoder = Decoder(
            channels=self.config.dec_channels,
            plan=self.plan,
            blocks=self.config.blocks_per_scale,
            remat=self.config.remat_training,
        )
        self.entropy_bottleneck = EntropyBottleneck(
            channels=self.config.enc_channels[-1],
            filters=self.config.entropy_filters,
            init_scale=self.config.entropy_init_scale,
        )

    def blockify(
        self, coords: jax.Array, valid: jax.Array, dtype=jnp.float32
    ) -> BlockGrid:
        """Padded voxel rows -> full-resolution BlockGrid (feats = mask).

        `dtype` sets the activation STORAGE dtype for the whole pyramid
        (conv outputs inherit it).  Training keeps float32; the codec
        encode path passes the compute dtype (bfloat16 in production) —
        at vox11 whole-frame scale the f32 activations alone were 18.2 GB
        (over one v5e's 15.75 GB); bf16 storage halves that, mirroring
        what the decode path already does in Coder._unpack_bottleneck.
        """
        bg = B.blockify(
            coords, valid[:, None].astype(dtype), valid,
            self.plan.nb[0], stride=1, res=self.plan.res,
            num_batches=self.num_batches,
        )
        return bg

    def __call__(
        self,
        coords: jax.Array,
        valid: jax.Array,
        training: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        x = self.blockify(coords, valid)
        y, out1, out0 = self.encoder(x, training)
        ground_truth_list = [out1, out0, x]
        nums_list = [gt.voxels_per_batch() for gt in ground_truth_list]

        mode = "noise" if training else "symbols"
        if training and rng is None:
            rng = self.make_rng("noise")
        y_f, likelihood = self.entropy_bottleneck(
            y.feats.reshape(-1, y.channels), mode, rng
        )
        # unoccupied slots carry no information: force likelihood 1 (0 bits)
        occ = y.mask.reshape(-1, 1)
        likelihood = jnp.where(occ, likelihood, 1.0)
        y_q = y.with_feats(y_f.reshape(y.nb_cap, B.VOL, y.channels))

        out_cls_list, out = self.decoder(
            y_q, nums_list,
            ground_truth_list if training else None,
            training,
        )
        return {
            "out": out,
            "out_cls_list": out_cls_list,
            "prior": y_q,
            "likelihood": likelihood.reshape(y.nb_cap, B.VOL, y.channels),
            "ground_truth_list": ground_truth_list,
            "nums_list": nums_list,
        }

    # --- codec entry points (used by pcgcv2_tpu.codec.coder) ---------------

    def encode_fn(self, coords: jax.Array, valid: jax.Array):
        """Analysis transform only: (bottleneck grid, per-scale GT counts,
        input voxel count).  `y.dropped` accumulates any block-capacity
        overflow from blockify through the bottleneck; the codec must check
        both it and n_in against the host-side point count before emitting a
        bitstream."""
        x = self.blockify(coords, valid, dtype=B.COMPUTE_DTYPE)
        y, out1, out0 = self.encoder(x)
        nums = [gt.voxels_per_batch() for gt in [out1, out0, x]]
        return y, nums, x.voxel_count()

    def decode_fn(self, y_q: BlockGrid, nums_list: Sequence[jax.Array]):
        """Synthesis transform from a decoded bottleneck (ref coder.py:110)."""
        _, out = self.decoder(y_q, nums_list, None, False)
        return out

    def decode_coarse_fn(
        self, y_q: BlockGrid, nums_list: Sequence[jax.Array]
    ) -> BlockGrid:
        """Decoder stages 0-1 only (strides 8->4->2): the small grids.  The
        streamed / spatially-sharded decoders run these whole and decompose
        only the final stage (the HBM hog)."""
        out = y_q
        for s in range(2):
            out, cls = self.decoder.stage(s, out)
            keep = B.topk_mask(out, cls.feats[:, :, 0], nums_list[s])
            out = B.compact(B.prune(out, keep), self.plan.dec_nb[s])
        return out

    def decode_stage2_fn(self, bg: BlockGrid, up_cap: int):
        """Final decoder stage on an arbitrary (sub-)grid: returns the
        pre-prune candidate grid's cls-logits grid.  Receptive field is 8
        voxels, so a 1-block input halo makes interior logits exact."""
        _, cls = self.decoder.stage(2, bg, up_cap=up_cap)
        return cls

    def pmf_fn(self, min_v, max_v_static: int):
        return self.entropy_bottleneck.pmf(min_v, max_v_static)
