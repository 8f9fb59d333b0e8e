"""Configuration dataclasses — the framework's single public knob surface.

The reference scatters hyperparameters across argparse defaults and hardcoded
constants (train.py:10-30, pcc_model.py:11-13, entropy_model.py:49); here they
live in typed, hashable dataclasses.  `CapacityPlan` is TPU-specific and has
no reference counterpart: XLA requires static shapes, so every scale of the
sparse pyramid gets a fixed row capacity (bucketed padding), chosen per
dataset/input size.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Tuple

# Mirrors ops.blocks.BS without importing jax at config time.  Surface
# block counts scale ~(8/BS)^2 (a 2-D surface crosses ~side^2 voxels of a
# side^3 block), which the capacity plans below fold in.
_BS = int(os.environ.get("PCGC_BLOCK_SIZE", "16"))


def _round_up(n: int, m: int) -> int:
    return int(math.ceil(n / m)) * m


@dataclasses.dataclass(frozen=True)
class CapacityPlan:
    """Static row capacities for each scale of the 3-level sparse pyramid.

    input  : capacity at full resolution (the collated batch's voxel count)
    scale1 : after the first stride-2 down-conv
    scale2 : after the second
    scale3 : bottleneck (stride 8)
    train_slack : during training, pruning keeps top-k UNION ground truth
        (ref autoencoder.py:241-244), which can approach 2x the true count.
    """

    input: int
    scale1: int
    scale2: int
    scale3: int
    train_slack: int = 2

    @classmethod
    def for_points(
        cls,
        n_points: int,
        ratios: Tuple[float, float, float] = (0.65, 0.4, 0.22),
        round_to: int = 1024,
        slack: float = 1.15,
    ) -> "CapacityPlan":
        """Plan for a batch totalling ~n_points voxels.

        Default ratios are conservative upper bounds on the per-downsample
        survival rate of dense surface scans (each 2x downsample of a 2-D
        surface in 3-D keeps ~25-60% of voxels depending on local density).
        """
        c0 = _round_up(int(n_points * slack), round_to)
        c1 = _round_up(int(n_points * ratios[0] * slack), round_to)
        c2 = _round_up(int(n_points * ratios[1] * slack), round_to)
        c3 = _round_up(int(n_points * ratios[2] * slack), round_to)
        return cls(input=c0, scale1=c1, scale2=c2, scale3=c3)

    @property
    def encoder_caps(self) -> Tuple[int, int, int]:
        return (self.scale1, self.scale2, self.scale3)

    def decoder_caps(self, training: bool) -> Tuple[int, int, int]:
        """Post-prune capacities for the three decode stages (coarse->fine)."""
        f = self.train_slack if training else 1
        k2 = min(8 * self.scale3, f * self.scale2)
        k1 = min(8 * k2, f * self.scale1)
        k0 = min(8 * k1, f * self.input)
        return (k2, k1, k0)


@dataclasses.dataclass(frozen=True)
class BlockPlan:
    """Static capacities for the dense-block backend (ops/blocks.py).

    res : full-resolution coordinate bound (power of two; voxel coords in
          [0, res)).  Static because the block lookup grid is dense.
    nb  : block-count capacities at strides (1, 2, 4, 8) — the 4 scales of
          the 3-level pyramid.  Each 8^3-block capacity bounds the number of
          *occupied* blocks at that scale; surface scans occupy roughly
          N/50 blocks at full resolution and ~1/4 of that per downsample.
    dec_nb : post-compaction block caps for the three decoder stages
          (coarse->fine, i.e. strides 4, 2, 1 after each generative
          up-convolution + prune).  Defaults to 2x the encoder caps: the
          training prune keeps top-k UNION ground truth
          (ref autoencoder.py:241-244) and rho-densified decoding can keep
          more blocks alive than the clean geometry would.
    """

    res: int
    nb: Tuple[int, int, int, int]
    dec_nb: Tuple[int, int, int] = ()
    # Pre-prune capacity factor per decoder stage: up_cap = factor * input
    # block cap.  8 is the static worst case (every parent block spawns 8
    # occupied child blocks); surfaces realistically spawn ~4, so the codec
    # path (for_cloud) uses tighter factors — overflow is detected at
    # runtime (BlockGrid.dropped) and raises rather than corrupting.
    up_factors: Tuple[int, int, int] = (8, 8, 8)
    # Absolute pre-prune caps per decoder stage; when set they override the
    # factor logic.  for_cloud ties them to the FINER scale's nb instead of
    # factor x the coarser stage's cap: candidate blocks are the children
    # blocks of the coarser survivors, i.e. ~1.1x the finer scale's true
    # occupied blocks (measured 4800 candidates vs 12288 factor-derived cap
    # on an 858k-pt vox10 frame — compounding slack the factor form can't
    # avoid).  Decode FLOPs scale with these caps.
    up_caps: Tuple[int, int, int] = ()

    def __post_init__(self):
        if not self.dec_nb:
            object.__setattr__(
                self, "dec_nb",
                (2 * self.nb[2], 2 * self.nb[1], 2 * self.nb[0]),
            )

    @classmethod
    def for_cloud(
        cls,
        n_points: int,
        res: int,
        blocks_per_point: float = (8 / _BS) ** 2 / 40,
        round_to: int = 512,
        slack: float = 1.3,
    ) -> "BlockPlan":
        """Plan for a frame of ~n_points voxels at `res` (codec path)."""
        nb0 = max(round_to, _round_up(
            int(n_points * blocks_per_point * slack), round_to))
        # Surface content measured at block side 16 (vox10/vox11 torus and
        # random-surface frames): per-stride occupied-block ratios
        # (1, 0.25, 0.065, 0.017) — each coordinate halving quarters a
        # 2-D surface's block count.  Margins widen toward the coarse end
        # where blocks are cheap.
        ratios = (1.0, 0.28, 0.09, 0.035)

        def cells(s):  # worst-case occupied blocks at scale s (batch 1)
            g = max(1, -(-max(1, res >> s) // _BS))
            return g ** 3 + 1

        nb = tuple(
            min(cells(s),
                max(round_to, _round_up(int(nb0 * r), round_to)))
            for s, r in enumerate(ratios)
        )
        # Decode-side capacities.  Post-prune caps (dec_nb) and pre-prune
        # candidate caps (up_caps) both track the FINER scale's nb: decoder
        # survivors mirror the encoder's per-scale footprint, and stage-s
        # candidates are the children blocks of the coarser survivors
        # (~1.1x the finer scale's true blocks).  Runtime overflow
        # detection raises rather than corrupting if content is denser;
        # Coder accepts per-instance overrides to recover.
        dec_nb = tuple(
            min(cells(i),
                _round_up(int(1.3 * nb[i]) + 1, round_to)) for i in (2, 1, 0)
        )
        up_caps = tuple(
            min(cells(i),
                _round_up(int(1.35 * nb[i]) + 1, round_to)) for i in (2, 1, 0)
        )
        return cls(res=res, nb=nb, dec_nb=dec_nb, up_factors=(5, 4, 3),
                   up_caps=up_caps)

    @classmethod
    def for_training(
        cls,
        capacity: int,
        res: int,
        batch_size: int,
        voxels_per_block: int = 20 * _BS * _BS // 64,
        round_to: int = 256,
    ) -> "BlockPlan":
        """Plan for a training batch: `capacity` padded voxel rows across
        `batch_size` items in a res^3 space.

        Each scale's block cap is the lesser of (a) the worst-case cell
        count of its grid and (b) the batch's expected occupied blocks
        (capacity / voxels_per_block, decaying per scale).
        """

        def g(s):  # blocks per axis at scale s
            return max(1, -(-max(1, res >> s) // _BS))

        per_item = max(256, capacity // max(batch_size, 1) // voxels_per_block)
        ratios = (1.0, 0.4, 0.2, 0.125)
        nb = []
        for s, r in enumerate(ratios):
            cells = batch_size * g(s) ** 3 + 1
            want = _round_up(int(batch_size * per_item * r), round_to) + 1
            nb.append(min(cells, want))
        # decoder stages (coarse->fine: strides 4, 2, 1 = scales 2, 1, 0):
        # 2x the encoder caps (top-k UNION ground truth in training),
        # clamped to each scale's worst-case cell count
        dec_nb = tuple(
            min(2 * nb[i], batch_size * g(i) ** 3 + 1) for i in (2, 1, 0)
        )
        return cls(res=res, nb=tuple(nb), dec_nb=dec_nb)

    @classmethod
    def for_frame(
        cls,
        res: int,
        blocks: Tuple[int, int, int, int],
        slack: float = 1.2,
        round_to: int = 512,
    ) -> "BlockPlan":
        """Exact-fit plan from MEASURED per-scale occupied-block counts.

        `for_cloud` sizes capacities from per-point density priors — safe
        but ~1.7-2.5x over the true footprint of a given frame (measured on
        the 858k-pt vox10 bench frame: nb0 7680 planned vs 4342 live,
        stage-2 candidates 10752 planned vs ~4800 true), and codec FLOPs
        scale with these caps.  The codec instead measures the true counts
        host-side at encode time (one key-dedup pass over coords it already
        dedups) and carries them in the bitstream header, so BOTH sides
        plan to the frame.

        blocks: occupied block counts at strides (1, 2, 4, 8).

        The decoder-stage caps derive exactly from these: a stage's
        candidate grid is the 2x generative upsample of the coarser GT
        voxels, and since every GT parent has a GT child and a parent's 8
        children never straddle a block boundary (2v is even, BS a power of
        two), the candidate blocks EQUAL the finer scale's GT blocks.
        `slack` covers decode-side drift (top-k false positives lighting
        blocks GT did not); overflow is still detected at runtime and the
        codec retries on the conservative `for_cloud` plan.  `round_to`
        buckets caps so similar frames share jit caches.
        """
        def cells(s):  # worst-case occupied blocks at scale s (batch 1)
            g = max(1, -(-max(1, res >> s) // _BS))
            return g ** 3 + 1

        def pad(s, n):
            return min(cells(s), max(
                round_to, _round_up(int(n * slack) + 1, round_to)))

        nb = tuple(pad(s, b) for s, b in enumerate(blocks))
        dec_nb = (nb[2], nb[1], nb[0])
        return cls(res=res, nb=nb, dec_nb=dec_nb, up_factors=(8, 8, 8),
                   up_caps=dec_nb)

    def up_cap(self, stage: int) -> int:
        """Pre-prune cap for decoder stage `stage` (0 = stride 8 -> 4)."""
        if self.up_caps:
            return self.up_caps[stage]
        prev = self.nb[3] if stage == 0 else self.dec_nb[stage - 1]
        return self.up_factors[stage] * prev


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture knobs (ref defaults: pcc_model.py:11-13)."""

    enc_channels: Tuple[int, ...] = (1, 16, 32, 64, 32, 8)
    dec_channels: Tuple[int, ...] = (8, 64, 32, 16)
    blocks_per_scale: int = 3
    entropy_filters: Tuple[int, ...] = (3, 3, 3)
    entropy_init_scale: float = 8.0
    # Rematerialize whole encoder scales / decoder stages in the training
    # backward pass (the production setting: the vox10-class step does not
    # fit one v5e's HBM without it).  jax.checkpoint is semantically
    # transparent, so small-model tests turn it off — the remat'd backward
    # multiplies XLA:CPU compile time several-fold.
    remat_training: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe (ref train.py:10-30, trainer.py:56-62,134)."""

    alpha: float = 1.0          # distortion weight
    beta: float = 1.0           # rate weight
    lr: float = 8e-4
    weight_decay: float = 1e-4  # torch Adam-style (L2 added to grads)
    batch_size: int = 8
    epochs: int = 50
    lr_min: float = 1e-5        # per-epoch halving floor (ref train.py:70)
    lr_halve_every: int = 1     # epochs between lr halvings; 1 = the ref
    #                             schedule.  Callers that chunk one logical
    #                             epoch into several train() calls (bounded
    #                             device uploads) raise this so the schedule
    #                             tracks logical epochs, not chunks.
    check_time: float = 10.0    # minutes between mid-epoch snapshots
    reset_optimizer_each_epoch: bool = True  # ref quirk (trainer.py:112)
