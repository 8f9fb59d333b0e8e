"""Rate-distortion loss and occupancy classification metrics
(ref /root/reference/loss.py, trainer.py:127-134), dense-block form.

All terms run on device with mask-aware dense math — the reference routes
`isin`/`istopk` through CPU numpy on every step (data_utils.py:63-89), its
main GPU pipeline stall; here the whole loss is inside jit and there is no
per-voxel gather anywhere.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp

from pcgcv2_tpu.ops import blocks as B
from pcgcv2_tpu.ops.blocks import BlockGrid

_LN2 = 0.6931471805599453


def bce_bits(cls_bg: BlockGrid, gt: BlockGrid) -> jnp.ndarray:
    """Summed binary cross-entropy, in bits, of occupancy logits vs ground
    truth membership (ref get_bce, loss.py:7-15: mean BCE / ln2 * N = sum)."""
    live = cls_bg.mask & cls_bg.valid[:, None]
    target = B.isin(cls_bg, gt).astype(jnp.float32)
    logits = cls_bg.feats[:, :, 0].astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    per = jnp.where(live, per, 0.0)
    return jnp.sum(per) / _LN2


def rate_bits(likelihood: jnp.ndarray) -> jnp.ndarray:
    """Total rate in bits (ref get_bits, loss.py:17-20).  Unoccupied slots
    carry likelihood 1.0 and contribute zero."""
    return -jnp.sum(jnp.log2(likelihood))


def rd_loss(
    out_set: Dict,
    alpha: float,
    beta: float,
    normalize: str = "train",
) -> Dict[str, jnp.ndarray]:
    """alpha * sum_scales BCE + beta * bpp.

    normalize='train' divides each scale's BCE by that scale's candidate
    count (ref trainer.py:129); 'test' divides by the input point count
    (ref trainer.py:89) — the reference's intentional asymmetry.
    """
    x = out_set["ground_truth_list"][-1]
    n_in = jnp.maximum(x.voxel_count().astype(jnp.float32), 1.0)
    bces: List[jnp.ndarray] = []
    for cls_bg, gt in zip(out_set["out_cls_list"], out_set["ground_truth_list"]):
        denom = (
            jnp.maximum(cls_bg.voxel_count().astype(jnp.float32), 1.0)
            if normalize == "train"
            else n_in
        )
        bces.append(bce_bits(cls_bg, gt) / denom)
    bce = sum(bces)
    bpp = rate_bits(out_set["likelihood"]) / n_in
    return {
        "loss": alpha * bce + beta * bpp,
        "bce": bce,
        "bces": jnp.stack(bces),
        "bpp": bpp,
    }


def cls_metrics(cls_bg: BlockGrid, gt: BlockGrid) -> jnp.ndarray:
    """[precision, recall, IoU] of top-k predicted occupancy vs ground truth
    (ref get_metrics/get_cls_metrics, loss.py:22-40), fully on device."""
    live = cls_bg.mask & cls_bg.valid[:, None]
    real = B.isin(cls_bg, gt)
    nums = gt.voxels_per_batch()
    pred = B.topk_mask(cls_bg, cls_bg.feats[:, :, 0], nums)
    tp = jnp.sum((pred & real).astype(jnp.float32))
    fp = jnp.sum((pred & ~real).astype(jnp.float32))
    fn = jnp.sum((~pred & real & live).astype(jnp.float32))
    precision = tp / (tp + fp + 1e-7)
    recall = tp / (tp + fn + 1e-7)
    iou = tp / (tp + fp + fn + 1e-7)
    return jnp.stack([precision, recall, iou])
