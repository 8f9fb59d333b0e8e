"""Multi-chip data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import optax
import pytest

from pcgcv2_tpu.config import CapacityPlan
from pcgcv2_tpu.data.synthetic import sphere_cloud
from pcgcv2_tpu.models import PCCModel
from pcgcv2_tpu.parallel.mesh import make_mesh
from pcgcv2_tpu.parallel.train import (
    collate_on_device,
    make_dp_train_step,
    pad_batch,
)
from pcgcv2_tpu.train.trainer import make_optimizer


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_collate_on_device_matches_host(rng):
    from pcgcv2_tpu.data.voxelize import collate

    clouds = [sphere_cloud(24, 1.0, s) for s in (0, 1, 2)]
    coords, counts = pad_batch(clouds, item_capacity=1024)
    sv_dev = jax.jit(
        lambda c, n: collate_on_device(c, n, capacity=4096)
    )(coords, counts)
    sv_host = collate(clouds, capacity=4096)
    np.testing.assert_array_equal(
        np.asarray(sv_dev.keys), np.asarray(sv_host.keys)
    )
    assert int(sv_dev.count) == int(sv_host.count)


@pytest.mark.slow
def test_dp_step_runs_and_matches_single_device():
    n_dev = 4
    local_batch = 1
    mesh = make_mesh(n_dev)
    clouds = [sphere_cloud(24, 1.0, s) for s in range(n_dev * local_batch)]
    coords, counts = pad_batch(clouds, item_capacity=1024)

    plan = CapacityPlan(1024, 768, 512, 256)
    model = PCCModel(plan=plan, num_batches=local_batch)
    x0 = jax.jit(lambda c, n: collate_on_device(c, n, plan.input))(
        coords[:1], counts[:1]
    )
    params = jax.jit(
        lambda a, b: model.init({"params": a, "noise": b}, x0, True)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1))

    tx = make_optimizer(1e-4)
    opt_state = tx.init(params)
    opt_state.hyperparams["lr"] = 1e-3

    step = make_dp_train_step(
        model, tx, mesh, alpha=1.0, beta=1.0,
        local_batch=local_batch, per_device_capacity=plan.input,
    )
    p2, o2, loss = step(params, opt_state, coords, counts,
                        jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp_abs_sum(a - b)), params, p2),
    )
    assert delta > 0


def jnp_abs_sum(x):
    import jax.numpy as jnp

    return jnp.sum(jnp.abs(x))
