import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pcgcv2_tpu.config import BlockPlan, ModelConfig
from pcgcv2_tpu.data.synthetic import sphere_cloud
from pcgcv2_tpu.data.voxelize import collate
from pcgcv2_tpu.models import PCCModel
from pcgcv2_tpu.ops import blocks as B
from pcgcv2_tpu.train.loss import cls_metrics, rd_loss


@pytest.fixture(autouse=True, scope="module")
def _production_dtypes():
    """Run this module's full-model compiles in production dtype mode.

    The suite-wide x64 flag (conftest) exists ONLY for the int64-key sparse
    oracle; under x64, XLA:CPU's backward-pass compiles blow up 10-25x
    (measured: 164 s f32 vs 25-70 min f64 for the same train-step graph —
    the round-3 suite stall).  Full-model tests neither use the oracle nor
    ship f64 anywhere, so they compile f32 like production."""
    import jax

    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)



@pytest.fixture(scope="module")
def setup():
    """One compile set shared by every test in this module (CPU compiles of
    the full model take ~30-70s each)."""
    from tests._tiny import TINY_MODEL

    clouds = [sphere_cloud(40, density=1.5, seed=s) for s in (0, 1)]
    coords, valid = collate(clouds, capacity=8192)
    plan = BlockPlan(res=64, nb=(512, 256, 128, 64))
    model = PCCModel(config=TINY_MODEL, plan=plan, num_batches=2)
    params = jax.jit(
        lambda k1, k2: model.init(
            {"params": k1, "noise": k2}, coords, valid, True
        )
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    fwd_train = jax.jit(
        lambda p, rng: model.apply(p, coords, valid, True,
                                   rngs={"noise": rng})
    )
    fwd_eval = jax.jit(lambda p: model.apply(p, coords, valid, False))
    out_train = fwd_train(params, jax.random.PRNGKey(2))
    out_eval = fwd_eval(params)
    return dict(
        model=model, params=params, coords=coords, valid=valid,
        clouds=clouds, out_train=out_train, out_eval=out_eval, plan=plan,
    )


def test_forward_training(setup):
    out, model, clouds = setup["out_train"], setup["model"], setup["clouds"]
    assert len(out["out_cls_list"]) == 3
    prior = out["prior"]
    assert out["likelihood"].shape == (prior.nb_cap, B.VOL, 8)
    lh = np.asarray(out["likelihood"])
    assert (lh > 0).all() and (lh <= 1 + 1e-6).all()
    # unoccupied slots carry likelihood exactly 1 (zero bits)
    occ = np.asarray(prior.mask & prior.valid[:, None])
    np.testing.assert_allclose(lh[~occ], 1.0)
    n3 = int(prior.voxel_count())
    assert 0 < n3 < sum(len(c) for c in clouds)
    counts = [int(gt.voxel_count()) for gt in out["ground_truth_list"]]
    assert counts[2] == sum(len(c) for c in clouds)  # input preserved
    assert counts[0] < counts[1] < counts[2]  # pyramid shrinks
    # training prune keeps topk UNION gt => final count >= input count
    assert int(out["out"].voxel_count()) >= counts[2]
    # no capacity overflow anywhere in the pipeline
    assert int(out["out"].dropped) == 0


def test_forward_eval_counts_exact(setup):
    out, clouds = setup["out_eval"], setup["clouds"]
    nums_final = np.asarray(out["nums_list"][2])
    np.testing.assert_array_equal(nums_final, [len(c) for c in clouds])
    assert int(out["out"].voxel_count()) == nums_final.sum()
    prior = out["prior"]
    occ = np.asarray(prior.mask & prior.valid[:, None])
    yq = np.asarray(prior.feats)[occ]
    np.testing.assert_array_equal(yq, np.round(yq))


def test_metrics_range(setup):
    out = setup["out_eval"]
    for cls_bg, gt in zip(out["out_cls_list"], out["ground_truth_list"]):
        m = np.asarray(jax.jit(cls_metrics)(cls_bg, gt))
        assert ((m >= 0) & (m <= 1)).all()


@pytest.mark.slow
def test_grads_and_overfit():
    """Gradients reach (nearly) all params and a few Adam steps reduce the
    RD loss — the end-to-end learning signal.

    Deliberately does NOT reuse the module fixture: XLA:CPU's backward
    compile under the suite's x64 mode grows superlinearly with shape
    (25-70 min at the fixture's res-64/cap-8192 — the round-3 suite
    stall), so this builds its own res-32/cap-2048 setup.  @slow: the
    backward compile alone measured 1292 s on this 1-core host in round 4
    (it stalled two full "not slow" runs at 74%); the trainer-module tests
    cover the same step-with-gradients path at the same shape."""
    from tests._tiny import TINY_MODEL

    clouds = [sphere_cloud(14, density=1.2, seed=s) for s in (0, 1)]
    coords, valid = collate(clouds, capacity=2048)
    plan = BlockPlan(res=32, nb=(128, 64, 64, 64))
    model = PCCModel(config=TINY_MODEL, plan=plan, num_batches=2)
    params = jax.jit(
        lambda k1, k2: model.init(
            {"params": k1, "noise": k2}, coords, valid, True
        )
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            out = model.apply(p, coords, valid, True, rngs={"noise": rng})
            return rd_loss(out, 1.0, 1.0)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, grads

    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(10):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss, grads = step(params, opt_state, sub)
        losses.append(float(loss))
        if i == 0:
            flat = jax.tree.leaves(grads)
            assert all(bool(jnp.isfinite(g).all()) for g in flat)
            nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in flat)
            assert nonzero > len(flat) * 0.9
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


@pytest.mark.slow
def test_remat_semantic_equivalence():
    """Loss and grads are identical with remat_training on vs off
    (jax.checkpoint is semantically transparent; this covers the
    production-default remat path the rest of the suite disables for
    XLA:CPU compile time — round-4 advisor finding).

    Kept minuscule (res 16, one 4-8ch IRN per scale, one tiny cloud) so the
    remat'd backward compiles in seconds even on a 1-core host.
    """
    import dataclasses

    from tests._tiny import TINY_MODEL

    micro = dataclasses.replace(
        TINY_MODEL,
        enc_channels=(1, 4, 4, 8, 8, 8),
        dec_channels=(8, 8, 4, 4),
    )
    cloud = sphere_cloud(6, density=1.0, seed=3)
    coords, valid = collate([cloud], capacity=256)
    plan = BlockPlan(res=16, nb=(32, 16, 8, 8))
    rng, noise = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    outs = {}
    for remat in (False, True):
        cfg = dataclasses.replace(micro, remat_training=remat)
        model = PCCModel(config=cfg, plan=plan, num_batches=1)
        params = model.init({"params": rng, "noise": noise},
                            coords, valid, True)

        def loss_fn(p, _model=model):
            out = _model.apply(p, coords, valid, True,
                               rngs={"noise": jax.random.PRNGKey(2)})
            return rd_loss(out, 1.0, 1.0)["loss"]

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        outs[remat] = (np.asarray(loss), jax.tree.leaves(grads))

    np.testing.assert_allclose(outs[False][0], outs[True][0],
                               rtol=1e-6, atol=0)
    for a, b in zip(outs[False][1], outs[True][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
