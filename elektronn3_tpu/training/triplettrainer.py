"""Metric-learning trainer with triplet margin loss.

Reference: elektronn3/training/triplettrainer.py:12-113: anchor /
positive / negative forward passes + GAP triplet margin loss. The train
dataset yields {'anchor', 'pos', 'neg'} (see data.cnndata.TripletData2d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu.modules.loss import GAPTripletMarginLoss
from elektronn3_tpu.training.trainer import NaNException, Trainer, TrainState


class TripletTrainer(Trainer):
    def __init__(self, *args, **kwargs):
        if kwargs.get("criterion") is None:
            kwargs["criterion"] = GAPTripletMarginLoss()
        super().__init__(*args, **kwargs)

    def _build_train_step(self):
        optimizer = self.optimizer
        criterion = self.criterion

        def train_step(state, anchor, pos, neg, rng, lr):
            def loss_fn(params):
                out_a, bs = self._apply(
                    params, state.batch_stats, anchor, True, rng)
                out_p, bs = self._apply(params, bs, pos, True, rng)
                out_n, bs = self._apply(params, bs, neg, True, rng)
                loss = criterion(out_a, out_p, out_n)
                return loss.astype(jnp.float32), bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            opt_state = state.opt_state
            if hasattr(opt_state, "hyperparams"):
                opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = optimizer.update(
                grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params=params, batch_stats=new_bs,
                              opt_state=opt_state,
                              step=state.step + 1), loss

        return jax.jit(train_step, donate_argnums=(0,))

    def _train(self, max_steps, max_runtime):
        """Triplet epoch loop (reference triplettrainer.py:42-113)."""
        from elektronn3_tpu.data.pipeline import DataLoader
        from elektronn3_tpu.training.train_utils import Timer

        stats = {"tr_loss": []}
        misc = {}
        timer = Timer()
        loader = DataLoader(
            self.train_dataset, batch_size=self.batch_size,
            num_workers=self.num_workers, seed=self.seed,
            channels_last=True,
            channels_last_keys=("anchor", "pos", "neg"))
        pending_loss = None
        running_vx = 0
        for batch in loader:
            a = jnp.asarray(batch["anchor"])
            p = jnp.asarray(batch["pos"])
            n = jnp.asarray(batch["neg"])
            lr = self.lr_scheduler.get_lr()
            self._rng, step_rng = jax.random.split(self._rng)
            self.state, loss = self._train_step_jit(
                self.state, a, p, n, step_rng, jnp.asarray(lr, jnp.float32))
            if pending_loss is not None:
                lval = float(pending_loss)
                stats["tr_loss"].append(lval)
                if np.isnan(lval):
                    raise NaNException("NaN loss detected!")
            pending_loss = loss
            self.step += 1
            running_vx += int(np.prod(a.shape)) * 3
            self._scheduler_step(loss)
            if self.step >= max_steps or \
                    self.start_time.t_passed >= max_runtime:
                self.terminate = True
            if self.terminate:
                break
        if pending_loss is not None:
            stats["tr_loss"].append(float(pending_loss))
        t = timer.t_passed
        misc["tr_speed"] = max(len(stats["tr_loss"]), 1) / t
        misc["tr_speed_vx"] = running_vx / t / 1e6
        misc["learning_rate"] = self.lr_scheduler.get_lr()
        stats["tr_loss_mean"] = float(np.mean(stats["tr_loss"])) \
            if stats["tr_loss"] else float("nan")
        return stats, misc

    def _validate(self):
        if self.valid_dataset is None:
            return {}
        from elektronn3_tpu.data.pipeline import DataLoader
        loader = DataLoader(
            self.valid_dataset, batch_size=self.batch_size, num_workers=0,
            shuffle=False, seed=self.seed, drop_last=False,
            channels_last=True,
            channels_last_keys=("anchor", "pos", "neg"))
        losses = []
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        for batch in loader:
            outs = [self.model.apply(variables, jnp.asarray(batch[k]),
                                     train=False)
                    for k in ("anchor", "pos", "neg")]
            losses.append(float(self.criterion(*outs)))
        return {"val_loss": float(np.mean(losses)) if losses
                else float("nan")}
