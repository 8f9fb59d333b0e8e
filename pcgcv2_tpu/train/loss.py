"""Rate-distortion loss and occupancy classification metrics
(ref /root/reference/loss.py, trainer.py:127-134).

All terms run on device with padding-aware masking — the reference routes
`isin`/`istopk` through CPU numpy on every step (data_utils.py:63-89), which
is its main GPU pipeline stall; here the whole loss is inside jit.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp

from pcgcv2_tpu import ops
from pcgcv2_tpu.ops.sparse import SparseVoxels

_LN2 = 0.6931471805599453


def occupancy_mask(cls_sv: SparseVoxels, gt_keys: jnp.ndarray) -> jnp.ndarray:
    """True where a candidate voxel exists in the ground truth (valid rows)."""
    return ops.keys.isin(gt_keys, cls_sv.keys) & cls_sv.valid


def bce_bits(cls_sv: SparseVoxels, gt_keys: jnp.ndarray) -> jnp.ndarray:
    """Summed binary cross-entropy, in bits, of occupancy logits vs ground
    truth membership (ref get_bce, loss.py:7-15: mean BCE / ln2 * N = sum)."""
    target = occupancy_mask(cls_sv, gt_keys).astype(jnp.float32)
    logits = cls_sv.feats[:, 0].astype(jnp.float32)
    # numerically-stable BCE-with-logits
    per = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    per = jnp.where(cls_sv.valid, per, 0.0)
    return jnp.sum(per) / _LN2


def rate_bits(likelihood: jnp.ndarray) -> jnp.ndarray:
    """Total rate in bits (ref get_bits, loss.py:17-20). Padding rows carry
    likelihood 1.0 and contribute zero."""
    return -jnp.sum(jnp.log2(likelihood))


def rd_loss(
    out_set: Dict,
    x: SparseVoxels,
    alpha: float,
    beta: float,
    normalize: str = "train",
) -> Dict[str, jnp.ndarray]:
    """alpha * sum_scales BCE + beta * bpp.

    normalize='train' divides each scale's BCE by that scale's candidate
    count (ref trainer.py:129); 'test' divides by the input point count
    (ref trainer.py:89) — the reference's intentional asymmetry.
    """
    n_in = jnp.maximum(x.count.astype(jnp.float32), 1.0)
    bces: List[jnp.ndarray] = []
    for cls_sv, gt in zip(out_set["out_cls_list"], out_set["ground_truth_list"]):
        denom = (
            jnp.maximum(cls_sv.count.astype(jnp.float32), 1.0)
            if normalize == "train"
            else n_in
        )
        bces.append(bce_bits(cls_sv, gt.keys) / denom)
    bce = sum(bces)
    bpp = rate_bits(out_set["likelihood"]) / n_in
    return {
        "loss": alpha * bce + beta * bpp,
        "bce": bce,
        "bces": jnp.stack(bces),
        "bpp": bpp,
    }


def cls_metrics(
    cls_sv: SparseVoxels, gt: SparseVoxels, num_batches: int
) -> jnp.ndarray:
    """[precision, recall, IoU] of top-k predicted occupancy vs ground truth
    (ref get_metrics/get_cls_metrics, loss.py:22-40), fully on device."""
    real = occupancy_mask(cls_sv, gt.keys)
    nums = gt.num_per_batch(num_batches)
    pred = ops.topk_mask(
        cls_sv, cls_sv.feats[:, 0], nums, num_batches
    )
    tp = jnp.sum((pred & real).astype(jnp.float32))
    fp = jnp.sum((pred & ~real).astype(jnp.float32))
    fn = jnp.sum((~pred & real & cls_sv.valid).astype(jnp.float32))
    precision = tp / (tp + fp + 1e-7)
    recall = tp / (tp + fn + 1e-7)
    iou = tp / (tp + fp + fn + 1e-7)
    return jnp.stack([precision, recall, iou])
