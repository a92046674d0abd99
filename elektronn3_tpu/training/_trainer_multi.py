"""Multi-label trainer with per-cube loss weights and gradient
accumulation.

Reference: elektronn3/training/_trainer_multi.py:27-322 (TrainerMulti):
- per-cube loss weights from ``cube_meta`` (:96-270)
- gradient accumulation over ``optimizer_iterations`` micro-batches
  (:32-35, 174-177)
- loss-border cropping via ``loss_crop`` (border regions excluded from
  the loss)

TPU-native: gradient accumulation is a ``lax.scan``-free accumulate-
then-apply pattern — micro-batch gradients are summed on device and the
optax update is applied once per ``optimizer_iterations`` steps.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from elektronn3_tpu.training.trainer import NaNException, Trainer, TrainState


class TrainerMulti(Trainer):
    def __init__(self, *args, optimizer_iterations: int = 1,
                 loss_crop: Optional[Sequence[int]] = None, **kwargs):
        self.optimizer_iterations = optimizer_iterations
        self.loss_crop = loss_crop
        super().__init__(*args, **kwargs)

    def _build_train_step(self):
        optimizer = self.optimizer
        criterion = self.criterion
        loss_crop = self.loss_crop

        def compute_grads(state, inp, target, rng, weight):
            def loss_fn(params):
                out, new_bs = self._apply(
                    params, state.batch_stats, inp, True, rng)
                tgt = target
                o = out
                if loss_crop is not None:
                    slc = (slice(None),) + tuple(
                        slice(c, s - c) for c, s in
                        zip(loss_crop, out.shape[1:-1]))
                    o = out[slc + (slice(None),)]
                    tgt = target[slc]
                loss = criterion(o, tgt) * weight
                return loss.astype(jnp.float32), new_bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return loss, grads, new_bs

        def accum_step(state, inp, target, rng, weight, grad_accum):
            loss, grads, new_bs = compute_grads(
                state, inp, target, rng, weight)
            grad_accum = jax.tree_util.tree_map(
                jnp.add, grad_accum, grads)
            # Return only what changed (batch_stats, loss, grad_accum);
            # params/opt_state passthrough outputs would break donation
            # matching for the donated grad_accum buffers.
            return new_bs, loss, grad_accum

        def apply_step(params, opt_state, grad_accum, lr, n_accum):
            grads = jax.tree_util.tree_map(
                lambda g: g / n_accum, grad_accum)
            if hasattr(opt_state, "hyperparams"):
                opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = optimizer.update(
                grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        # Donate only buffers with a matching output to alias: grad_accum
        # in the accumulate step (updated in place), params/opt_state in
        # the apply step. grad_accum has NO output in apply_step and
        # batch_stats passes through untouched — donating either would
        # trigger "donated buffers were not usable".
        self._accum_step_jit = jax.jit(accum_step, donate_argnums=(5,))
        self._apply_step_jit = jax.jit(apply_step, donate_argnums=(0, 1))
        return None  # train loop drives the two-phase steps directly

    def _zero_grads(self):
        return jax.tree_util.tree_map(jnp.zeros_like, self.state.params)

    def _train(self, max_steps, max_runtime):
        from elektronn3_tpu.data.pipeline import DataLoader, \
            prefetch_to_device
        from elektronn3_tpu.training.train_utils import Timer

        stats = {"tr_loss": []}
        misc = {}
        timer = Timer()
        loader = DataLoader(
            self.train_dataset, batch_size=self.batch_size,
            num_workers=self.num_workers, seed=self.seed,
            channels_last=True)
        grad_accum = self._zero_grads()
        n_accum = 0
        running_vx = 0
        pending_loss = None
        for batch in prefetch_to_device(loader, size=2):
            inp, target = batch["inp"], batch.get("target")
            meta = batch.get("cube_meta")
            weight = jnp.asarray(1.0, jnp.float32)
            if meta is not None:
                m = np.asarray(meta, np.float64)
                w = np.where(np.isfinite(m), m, 1.0).mean()
                weight = jnp.asarray(w, jnp.float32)
            self._rng, step_rng = jax.random.split(self._rng)
            new_bs, loss, grad_accum = self._accum_step_jit(
                self.state, inp, target, step_rng, weight, grad_accum)
            self.state = TrainState(
                params=self.state.params, batch_stats=new_bs,
                opt_state=self.state.opt_state, step=self.state.step)
            n_accum += 1
            # Delayed loss fetch: read the PREVIOUS step's loss so the
            # device queue never drains on a host round trip (same
            # pattern as the main Trainer's batched NaN guard).
            if pending_loss is not None:
                lval = float(pending_loss)
                stats["tr_loss"].append(lval)
                if np.isnan(lval):
                    raise NaNException("NaN loss detected!")
            pending_loss = loss
            if n_accum >= self.optimizer_iterations:
                lr = self.lr_scheduler.get_lr()
                params, opt_state = self._apply_step_jit(
                    self.state.params, self.state.opt_state, grad_accum,
                    jnp.asarray(lr, jnp.float32), float(n_accum))
                self.state = TrainState(
                    params=params, batch_stats=self.state.batch_stats,
                    opt_state=opt_state, step=self.state.step + 1)
                grad_accum = self._zero_grads()
                n_accum = 0
                self.step += 1
                self._scheduler_step(loss)
            running_vx += int(np.prod(inp.shape))
            if self.step >= max_steps or \
                    self.start_time.t_passed >= max_runtime:
                self.terminate = True
            if self.terminate:
                break
        if pending_loss is not None:
            lval = float(pending_loss)
            stats["tr_loss"].append(lval)
            if np.isnan(lval):
                raise NaNException("NaN loss detected!")
        t = timer.t_passed
        misc["tr_speed"] = max(len(stats["tr_loss"]), 1) / t
        misc["tr_speed_vx"] = running_vx / t / 1e6
        misc["learning_rate"] = self.lr_scheduler.get_lr()
        stats["tr_loss_mean"] = float(np.mean(stats["tr_loss"])) \
            if stats["tr_loss"] else float("nan")
        return stats, misc
