"""Data-parallel training step over a device mesh (shard_map + psum).

Point clouds in a batch are independent, so the natural TPU scale-out is to
shard the batch dimension over ICI: each device assembles its shard of
per-item padded point sets into padded voxel rows, runs the full
forward/backward (blockify happens on-device inside the jitted model), and
all-reduces gradients with `jax.lax.pmean`.  Parameters and optimizer state
stay replicated; after the pmean every device applies the identical update
(standard DP).

Inputs are [B, P, 3] padded per-item coordinate arrays + [B] counts — the
host-side loader only pads; everything else is inside the jitted step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pcgcv2_tpu.parallel.mesh import DP_AXIS
from pcgcv2_tpu.train.loss import rd_loss


def collate_on_device(
    coords: jax.Array, counts: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """[B, P, 3] + [B] -> padded voxel rows ([B*P, 4], [B*P] valid),
    entirely inside jit (the model's blockify consumes these directly)."""
    b, p, _ = coords.shape
    batch_ids = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None], (b, p, 1)
    )
    rows = jnp.concatenate(
        [batch_ids, coords.astype(jnp.int32)], axis=-1
    ).reshape(b * p, 4)
    valid = (
        jnp.arange(p, dtype=jnp.int32)[None, :] < counts[:, None]
    ).reshape(b * p)
    return rows, valid


def pad_batch(coords_list, item_capacity: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: list of [N_i, 3] -> ([B, P, 3], [B]) padded arrays."""
    b = len(coords_list)
    out = np.zeros((b, item_capacity, 3), dtype=np.int32)
    counts = np.zeros((b,), dtype=np.int32)
    for i, c in enumerate(coords_list):
        n = min(len(c), item_capacity)
        out[i, :n] = c[:n]
        counts[i] = n
    return out, counts


def make_dp_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    alpha: float,
    beta: float,
):
    """Build the jitted DP step.

    model: a PCCModel whose num_batches equals the per-device item count.
    Returns step(params, opt_state, coords [B,P,3], counts [B], rng) ->
    (params, opt_state, loss) with B = n_devices * local_batch.
    """

    def local_step(params, opt_state, coords, counts, rng):
        # per-device shard: [local_batch, P, 3]
        rows, valid = collate_on_device(coords, counts)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))

        def loss_fn(p):
            out = model.apply(p, rows, valid, True, rngs={"noise": rng})
            return rd_loss(out, alpha, beta, "train")["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, DP_AXIS)
        loss = jax.lax.pmean(loss, DP_AXIS)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(DP_AXIS), P(DP_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
