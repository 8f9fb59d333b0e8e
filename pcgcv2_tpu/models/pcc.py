"""PCCModel — encoder + factorized entropy bottleneck + decoder
(ref /root/reference/pcc_model.py)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcgcv2_tpu.config import CapacityPlan, ModelConfig
from pcgcv2_tpu.models.autoencoder import Decoder, Encoder
from pcgcv2_tpu.models.entropy import EntropyBottleneck
from pcgcv2_tpu.ops.sparse import SparseVoxels


class PCCModel(nn.Module):
    """Full compression model.

    forward returns the same payload as the reference (pcc_model.py:41-45):
    reconstructed tensor, per-scale pre-prune occupancy logits, the quantized
    prior, feature likelihoods, and the ground-truth pyramid.
    """

    config: ModelConfig = ModelConfig()
    plan: CapacityPlan = CapacityPlan(8192, 8192, 4096, 2048)
    num_batches: int = 1

    def setup(self):
        self.encoder = Encoder(
            channels=self.config.enc_channels,
            caps=self.plan.encoder_caps,
            blocks=self.config.blocks_per_scale,
        )
        self.decoder = Decoder(
            channels=self.config.dec_channels,
            blocks=self.config.blocks_per_scale,
            num_batches=self.num_batches,
        )
        self.entropy_bottleneck = EntropyBottleneck(
            channels=self.config.enc_channels[-1],
            filters=self.config.entropy_filters,
            init_scale=self.config.entropy_init_scale,
        )

    def __call__(
        self, x: SparseVoxels, training: bool = True, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        y, out1, out0 = self.encoder(x)
        ground_truth_list = [out1, out0, x]
        nums_list = [
            gt.num_per_batch(self.num_batches) for gt in ground_truth_list
        ]

        mode = "noise" if training else "symbols"
        if training and rng is None:
            rng = self.make_rng("noise")
        y_f, likelihood = self.entropy_bottleneck(y.feats, mode, rng)
        # padding rows carry no information: force likelihood 1 (zero bits)
        likelihood = jnp.where(y.valid[:, None], likelihood, 1.0)
        y_q = y.with_feats(y_f)

        out_cls_list, out = self.decoder(
            y_q,
            nums_list,
            [gt.keys for gt in ground_truth_list] if training else None,
            self.plan.decoder_caps(training),
            training,
        )
        return {
            "out": out,
            "out_cls_list": out_cls_list,
            "prior": y_q,
            "likelihood": likelihood,
            "ground_truth_list": ground_truth_list,
            "nums_list": nums_list,
        }

    # --- codec entry points (used by pcgcv2_tpu.codec.coder) ---------------

    def encode_fn(self, x: SparseVoxels):
        """Analysis transform only: returns (y, per-scale GT counts)."""
        y, out1, out0 = self.encoder(x)
        nums = [
            gt.num_per_batch(self.num_batches) for gt in [out1, out0, x]
        ]
        return y, nums

    def decode_fn(self, y_q: SparseVoxels, nums_list, prune_caps):
        """Synthesis transform from a decoded bottleneck (ref coder.py:110)."""
        _, out = self.decoder(y_q, nums_list, None, prune_caps, False)
        return out

    def pmf_fn(self, min_v, max_v_static: int):
        return self.entropy_bottleneck.pmf(min_v, max_v_static)
