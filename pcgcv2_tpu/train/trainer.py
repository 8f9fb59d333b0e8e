"""Training loop (ref /root/reference/trainer.py, train.py).

Faithful recipe, TPU-native execution:
  * loss = alpha * sum(per-scale BCE) + beta * bpp (ref trainer.py:134)
  * Adam(0.9, 0.999) with torch-style weight decay 1e-4 — L2 added to the
    gradient before the moment updates (ref trainer.py:60), which is
    `optax.add_decayed_weights` *before* `scale_by_adam`, not AdamW.
  * optimizer state reset every epoch (ref trainer.py:112 rebuilds Adam each
    epoch — a quirk we reproduce by default, switchable in TrainConfig).
  * per-epoch lr halving floored at lr_min (ref train.py:70), injected as an
    optax hyperparam so the jitted step never recompiles.
  * checkpoints: flax-serialized.  `save_model` writes weights-only release
    checkpoints (the reference's format, trainer.py:51-54); `save_state` /
    `restore_state` persist the FULL train state (params, optimizer moments,
    epoch, lr, RNG) for exact resume — a gap in the reference, whose resume
    restarts the schedule.

The whole step (forward, loss, isin/topk ground truth, backward, Adam) is one
jitted function — no host round-trips inside the loop.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from pcgcv2_tpu.config import BlockPlan, ModelConfig, TrainConfig
from pcgcv2_tpu.data.voxelize import collate
from pcgcv2_tpu.models import PCCModel
from pcgcv2_tpu.train.loss import cls_metrics, rd_loss


def get_logger(logdir: str) -> logging.Logger:
    """File + console logger (ref trainer.py:24-37)."""
    os.makedirs(logdir, exist_ok=True)
    logger = logging.getLogger(f"pcgcv2_tpu.{logdir}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s: %(message)s", datefmt="%m/%d %H:%M:%S")
        fh = logging.FileHandler(os.path.join(logdir, "log.txt"))
        fh.setFormatter(fmt)
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        logger.addHandler(fh)
        logger.addHandler(ch)
    return logger


def make_optimizer(weight_decay: float):
    """torch.optim.Adam(lr, betas=(0.9, 0.999), weight_decay=wd) equivalent."""

    def tx_factory(lr):
        # pin f32: under x64 (test suite) an injected python-float lr becomes
        # f64 and would promote every parameter through the update
        lr = jnp.asarray(lr, jnp.float32)
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.scale(-lr),
        )

    return optax.inject_hyperparams(tx_factory)(lr=1e-3)


class Trainer:
    """Single-host trainer.  For multi-chip data parallelism see
    pcgcv2_tpu.parallel.train (same step math under shard_map).

    plan: BlockPlan sized for the training batch (res covers the dataset's
    coordinate bound, nb covers the batch's occupied 8^3 blocks per scale);
    capacity: padded voxel-row budget of one collated batch.
    """

    def __init__(
        self,
        config: TrainConfig,
        plan: BlockPlan,
        capacity: int,
        model_config: ModelConfig = ModelConfig(),
        logdir: str = "./logs/tp",
        ckptdir: str = "./ckpts/tp",
        init_ckpt: str = "",
        seed: int = 0,
    ):
        self.config = config
        self.plan = plan
        self.capacity = capacity
        self.logdir = logdir
        self.ckptdir = ckptdir
        os.makedirs(ckptdir, exist_ok=True)
        self.logger = get_logger(logdir)
        self.model = PCCModel(
            config=model_config, plan=plan, num_batches=config.batch_size
        )
        self.rng = jax.random.PRNGKey(seed)
        self.epoch = 0
        self.lr = config.lr
        # traced loss-weight operand shared by all step/eval compiles (see
        # _build_step_fns): rate-ladder sweeps reuse ONE compiled step
        self._ab = jnp.asarray(
            [config.alpha, config.beta], dtype=jnp.float32
        )
        self.tx = make_optimizer(config.weight_decay)
        self.params = None
        self.opt_state = None
        self._init_ckpt = init_ckpt
        self._step_fn = None
        self._eval_fn = None
        self.record_set: Dict[str, List] = {
            "bce": [], "bces": [], "bpp": [], "sum_loss": [], "metrics": []
        }

    # --- setup --------------------------------------------------------------

    def _ensure_initialized(self, coords, valid):
        if self.params is not None:
            return
        if self._init_ckpt:
            self.params = load_params(self._init_ckpt)
            self.logger.info(f"Load checkpoint from {self._init_ckpt}")
        else:
            k1, k2 = jax.random.split(self.rng)
            self.params = jax.jit(
                lambda a, b: self.model.init(
                    {"params": a, "noise": b}, coords, valid, True
                )
            )(k1, k2)
            self.logger.info("Random initialization.")
        self.opt_state = self.tx.init(self.params)
        self._build_step_fns()

    def _build_step_fns(self):
        model, tx = self.model, self.tx

        # alpha/beta ride as a traced [2] operand, NOT closure constants:
        # baked-in floats would give every rate point of a ladder sweep a
        # distinct HLO and its own full compile (~10 min each on the remote
        # tunnel); as operands, all 7 points share one compiled step.
        @jax.jit
        def step(params, opt_state, coords, valid, rng, ab):
            def loss_fn(p):
                out = model.apply(
                    p, coords, valid, True, rngs={"noise": rng}
                )
                d = rd_loss(out, ab[0], ab[1], "train")
                mets = jnp.stack(
                    [
                        cls_metrics(c, g)
                        for c, g in zip(
                            out["out_cls_list"], out["ground_truth_list"]
                        )
                    ]
                )
                return d["loss"], (d, mets, out["out"].dropped)

            (_, (d, mets, n_drop)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, d, mets, n_drop

        @jax.jit
        def evaluate(params, coords, valid, ab):
            out = model.apply(params, coords, valid, False)
            d = rd_loss(out, ab[0], ab[1], "test")
            mets = jnp.stack(
                [
                    cls_metrics(c, g)
                    for c, g in zip(out["out_cls_list"], out["ground_truth_list"])
                ]
            )
            return d, mets

        self._step_fn = step
        self._eval_fn = evaluate

        @jax.jit
        def epoch_scan(params, opt_state, coords_all, valid_all, rngs, ab):
            """Whole epoch in one dispatch: the remote-TPU tunnel charges
            ~0.75 s per transfer regardless of size, so per-step H2D/D2H
            (the reference's DataLoader pattern, and our own round-2 loop)
            dominates wall clock by ~7x.  lax.scan over the stacked,
            pre-collated batches -> one upload + one packed fetch."""

            def body(carry, xs):
                params, opt_state = carry
                coords, valid, rng = xs
                params, opt_state, d, mets, n_drop = step(
                    params, opt_state, coords, valid, rng, ab
                )
                stats = jnp.concatenate(
                    [
                        jnp.stack(
                            [d["bce"], d["bpp"], n_drop.astype(jnp.float32)]
                        ),
                        d["bces"],
                    ]
                )
                return (params, opt_state), (stats, mets)

            (params, opt_state), (stats, mets) = jax.lax.scan(
                body, (params, opt_state), (coords_all, valid_all, rngs)
            )
            return params, opt_state, stats, mets

        self._epoch_fn = epoch_scan

        @jax.jit
        def eval_scan(params, coords_all, valid_all, ab):
            def body(_, xs):
                coords, valid = xs
                d, mets = evaluate(params, coords, valid, ab)
                stats = jnp.concatenate(
                    [jnp.stack([d["bce"], d["bpp"]]), d["bces"]]
                )
                return (), (stats, mets)

            _, (stats, mets) = jax.lax.scan(
                body, (), (coords_all, valid_all)
            )
            return stats, mets

        self._eval_scan_fn = eval_scan

    def _collate(self, coords_list: Sequence[np.ndarray]):
        return collate(coords_list, capacity=self.capacity)

    # --- bookkeeping ----------------------------------------------------------

    def record(self, tag: str, step: int):
        self.logger.info("=" * 10 + f"{tag} Epoch {self.epoch} Step {step}")
        for k, v in self.record_set.items():
            if v:
                mean = np.mean(np.array(v), axis=0)
                self.logger.info(f"{k}: {np.round(mean, 4).tolist()}")
        for k in self.record_set:
            self.record_set[k] = []

    def save_model(self, name: Optional[str] = None):
        """Weights-only release checkpoint (ref trainer.py:51-54 format)."""
        path = os.path.join(self.ckptdir, name or f"epoch_{self.epoch}.ckpt")
        save_params(path, self.params)
        return path

    def save_state(self, name: str = "train_state.ckpt") -> str:
        """Full train state for exact resume (params + optimizer moments +
        epoch + lr + RNG) — beyond the reference's weights-only saves."""
        path = os.path.join(self.ckptdir, name)
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": self.epoch,
            "lr": self.lr,
            "rng": self.rng,
        }
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(state))
        return path

    def restore_state(self, path: str, coords, valid) -> None:
        """Inverse of save_state; (coords, valid) seed the param/opt
        templates when the trainer is not yet initialized."""
        self._init_ckpt = ""
        if self.params is None:
            self._ensure_initialized(coords, valid)
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": 0,
            "lr": 0.0,
            "rng": self.rng,
        }
        with open(path, "rb") as f:
            state = serialization.from_bytes(template, f.read())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.epoch = int(state["epoch"])
        self.lr = float(state["lr"])
        self.rng = jnp.asarray(state["rng"])

    # --- loops ---------------------------------------------------------------

    def train(self, batches: Iterable[Sequence[np.ndarray]]):
        """One epoch over an iterable of batches (lists of [N,3] coords)."""
        self.logger.info("=" * 40 + f"\nTraining Epoch: {self.epoch}")
        if self.epoch > 0 and self.epoch % self.config.lr_halve_every == 0:
            self.lr = max(self.lr / 2, self.config.lr_min)  # ref train.py:70
        start_time = time.time()
        n_steps = 0
        for batch_step, coords_list in enumerate(batches):
            total = sum(len(c) for c in coords_list)
            if total > self.capacity:
                self.logger.info(
                    f"skip oversized batch ({total} > {self.capacity})"
                )
                continue
            coords, valid = self._collate(coords_list)
            self._ensure_initialized(coords, valid)
            if batch_step == 0 and self.config.reset_optimizer_each_epoch:
                self.opt_state = self.tx.init(self.params)  # ref trainer.py:112
            self.opt_state.hyperparams["lr"] = jnp.asarray(
                self.lr, dtype=jnp.float32
            )
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_state, d, mets, n_drop = self._step_fn(
                self.params, self.opt_state, coords, valid, sub, self._ab
            )
            n_steps += 1
            if int(n_drop):
                # BlockGrid.dropped contract (ops/blocks.py): nonzero means
                # the step ran on corrupted geometry — surface loudly.  The
                # parameters already absorbed the update; warn so the user
                # resizes the plan (the codec path raises instead).
                self.logger.warning(
                    f"step dropped {int(n_drop)} occupied blocks "
                    f"(plan {self.plan} too small for this batch) — "
                    f"this step trained on corrupted geometry; raise the "
                    f"BlockPlan capacities"
                )
            self.record_set["bce"].append(float(d["bce"]))
            self.record_set["bces"].append(np.asarray(d["bces"]))
            self.record_set["bpp"].append(float(d["bpp"]))
            self.record_set["sum_loss"].append(float(d["bce"]) + float(d["bpp"]))
            self.record_set["metrics"].append(np.asarray(mets))
            if time.time() - start_time > self.config.check_time * 60:
                self.record("Train", self.epoch * 10000 + batch_step)
                self.save_model()
                start_time = time.time()
        if n_steps:
            self.record("Train", self.epoch * 10000 + n_steps)
            self.save_model()
        self.epoch += 1

    def train_scanned(
        self,
        batches: Sequence[Sequence[np.ndarray]],
        mode: str = "scan",
    ):
        """One epoch with a single H2D upload and a single packed fetch.

        mode="scan": the whole epoch is ONE device dispatch (lax.scan over
        the stacked pre-collated batches, see _build_step_fns.epoch_scan).
        mode="loop": per-step dispatches over device-resident data (same
        transfer profile, no scan compile).  `batches`: list of lists of
        [N,3] coords; oversized batches are dropped host-side so every step
        shares the static collated shape."""
        self.logger.info("=" * 40 + f"\nTraining Epoch: {self.epoch}")
        if self.epoch > 0 and self.epoch % self.config.lr_halve_every == 0:
            self.lr = max(self.lr / 2, self.config.lr_min)  # ref train.py:70
        kept = []
        for coords_list in batches:
            total = sum(len(c) for c in coords_list)
            if total > self.capacity:
                self.logger.info(
                    f"skip oversized batch ({total} > {self.capacity})"
                )
                continue
            kept.append(coords_list)
        if not kept:
            self.epoch += 1
            return
        collated = [self._collate(cl) for cl in kept]
        coords_all = np.stack([c for c, _ in collated])
        valid_all = np.stack([v for _, v in collated])
        self._ensure_initialized(*collated[0])
        if self.config.reset_optimizer_each_epoch:
            self.opt_state = self.tx.init(self.params)  # ref trainer.py:112
        self.opt_state.hyperparams["lr"] = jnp.asarray(
            self.lr, dtype=jnp.float32
        )
        self.rng, sub = jax.random.split(self.rng)
        rngs = jax.random.split(sub, len(kept))
        if mode == "scan":
            self.params, self.opt_state, stats, mets = self._epoch_fn(
                self.params, self.opt_state, coords_all, valid_all, rngs,
                self._ab,
            )
        else:
            # device-resident loop: one H2D for the epoch, per-step
            # dispatches stay async (nothing is fetched inside the loop),
            # one packed fetch at the end.  Same math as the scan; trades
            # ~25 ms tunnel dispatch per step for not compiling lax.scan
            # over the step (pathological on some backends).
            coords_all = jax.device_put(coords_all)
            valid_all = jax.device_put(valid_all)
            params, opt_state = self.params, self.opt_state
            stats_l, mets_l = [], []
            for i in range(len(kept)):
                params, opt_state, d, m, n_drop = self._step_fn(
                    params, opt_state, coords_all[i], valid_all[i], rngs[i],
                    self._ab,
                )
                stats_l.append(jnp.concatenate([
                    jnp.stack(
                        [d["bce"], d["bpp"], n_drop.astype(jnp.float32)]
                    ),
                    d["bces"],
                ]))
                mets_l.append(m)
            self.params, self.opt_state = params, opt_state
            stats, mets = jnp.stack(stats_l), jnp.stack(mets_l)
        stats, mets = jax.device_get((stats, mets))
        for row, m in zip(np.asarray(stats), np.asarray(mets)):
            bce, bpp, n_drop, bces = row[0], row[1], row[2], row[3:]
            if n_drop:
                self.logger.warning(
                    f"step dropped {int(n_drop)} occupied blocks "
                    f"(plan {self.plan} too small for this batch) — "
                    f"this step trained on corrupted geometry; raise the "
                    f"BlockPlan capacities"
                )
            self.record_set["bce"].append(float(bce))
            self.record_set["bces"].append(bces)
            self.record_set["bpp"].append(float(bpp))
            self.record_set["sum_loss"].append(float(bce) + float(bpp))
            self.record_set["metrics"].append(m)
        self.record("Train", self.epoch * 10000 + len(kept))
        self.save_model()
        self.epoch += 1

    def test_scanned(
        self,
        batches: Sequence[Sequence[np.ndarray]],
        tag: str = "Test",
        mode: str = "loop",
    ):
        """Batched twin of test(): one upload + one packed fetch."""
        kept = [
            cl for cl in batches
            if sum(len(c) for c in cl) <= self.capacity
        ]
        if not kept:
            return
        collated = [self._collate(cl) for cl in kept]
        coords_all = np.stack([c for c, _ in collated])
        valid_all = np.stack([v for _, v in collated])
        self._ensure_initialized(*collated[0])
        if mode == "scan":
            stats, mets = self._eval_scan_fn(
                self.params, coords_all, valid_all, self._ab
            )
        else:
            coords_all = jax.device_put(coords_all)
            valid_all = jax.device_put(valid_all)
            rows = []
            for i in range(len(kept)):
                d, m = self._eval_fn(
                    self.params, coords_all[i], valid_all[i], self._ab
                )
                rows.append((jnp.concatenate(
                    [jnp.stack([d["bce"], d["bpp"]]), d["bces"]]
                ), m))
            stats = jnp.stack([r[0] for r in rows])
            mets = jnp.stack([r[1] for r in rows])
        stats, mets = jax.device_get((stats, mets))
        for row, m in zip(np.asarray(stats), np.asarray(mets)):
            self.record_set["bce"].append(float(row[0]))
            self.record_set["bces"].append(row[2:])
            self.record_set["bpp"].append(float(row[1]))
            self.record_set["sum_loss"].append(float(row[0]) + float(row[1]))
            self.record_set["metrics"].append(m)
        self.record(tag, self.epoch)

    def test(self, batches: Iterable[Sequence[np.ndarray]], tag: str = "Test"):
        for coords_list in batches:
            total = sum(len(c) for c in coords_list)
            if total > self.capacity:
                continue
            coords, valid = self._collate(coords_list)
            self._ensure_initialized(coords, valid)
            d, mets = self._eval_fn(self.params, coords, valid, self._ab)
            self.record_set["bce"].append(float(d["bce"]))
            self.record_set["bces"].append(np.asarray(d["bces"]))
            self.record_set["bpp"].append(float(d["bpp"]))
            self.record_set["sum_loss"].append(float(d["bce"]) + float(d["bpp"]))
            self.record_set["metrics"].append(np.asarray(mets))
        self.record(tag, self.epoch)


# --- checkpoint helpers (weights-only, ref trainer.py:51-54 semantics) -------


def save_params(path: str, params) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template=None):
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)
