"""Noise2Void self-supervised denoising trainer (arXiv:1811.10980).

Reference: elektronn3/training/noise2void.py:26-243. Stratified
blind-spot pixel masking: a random subset of pixels is replaced by
random neighbors; the model is trained to predict the ORIGINAL values at
exactly those pixels (MaskedMSELoss), so it can only learn structure,
not the (pixelwise independent) noise.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from elektronn3_tpu.modules.loss import masked_mse_loss
from elektronn3_tpu.training.trainer import Trainer


def get_stratified_coords(ratio: float, shape: Sequence[int],
                          rng: Optional[np.random.Generator] = None
                          ) -> Tuple[np.ndarray, ...]:
    """Jittered-grid random coordinates covering ~ratio of the array.
    Reference noise2void.py:26-50."""
    rng = rng or np.random.default_rng()
    ndim = len(shape)
    box_size = int(np.round(np.sqrt(100 / (ratio * 100)))) if ndim == 2 \
        else int(np.round((100 / (ratio * 100)) ** (1 / ndim)))
    box_size = max(box_size, 1)
    coords = [[] for _ in range(ndim)]
    ranges = [range(0, s, box_size) for s in shape]
    import itertools
    for corner in itertools.product(*ranges):
        offset = rng.integers(0, box_size, ndim)
        pt = [min(c + o, s - 1) for c, o, s in zip(corner, offset, shape)]
        for d in range(ndim):
            coords[d].append(pt[d])
    return tuple(np.array(c) for c in coords)


def prepare_sample(inp: np.ndarray, ratio: float = 0.002,
                   channels: Optional[Sequence[int]] = None,
                   rng: Optional[np.random.Generator] = None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mask stratified pixels by replacing them with random in-patch
    neighbors. Returns (masked_inp, target=original, mask).
    Input layout (C, *spatial); reference noise2void.py:52-77."""
    rng = rng or np.random.default_rng()
    masked = np.array(inp, copy=True)
    mask = np.zeros_like(inp, dtype=np.float32)
    spatial = inp.shape[1:]
    chans = range(inp.shape[0]) if channels is None else channels
    for c in chans:
        coords = get_stratified_coords(ratio, spatial, rng)
        # Replace with random neighbor values within a 5-voxel window
        repl = []
        for d, cs in enumerate(coords):
            shift = rng.integers(-2, 3, len(cs))
            repl.append(np.clip(cs + shift, 0, spatial[d] - 1))
        masked[(c,) + tuple(coords)] = inp[(c,) + tuple(repl)]
        mask[(c,) + tuple(coords)] = 1.0
    return masked, np.asarray(inp, np.float32), mask


class Noise2VoidTrainer(Trainer):
    """Trainer for Noise2Void: builds the blind-spot masked batch from
    raw inputs and optimizes masked MSE. Reference noise2void.py:79-224.

    The train dataset only needs to yield {'inp': (C, *spatial)}; masking
    happens here. An optional ``n2v_ratio`` controls the masked-pixel
    fraction.
    """

    def __init__(self, *args, n2v_ratio: float = 0.002, **kwargs):
        self.n2v_ratio = n2v_ratio
        if kwargs.get("criterion") is None:
            kwargs["criterion"] = _N2VCriterion()
        super().__init__(*args, **kwargs)
        self._n2v_rng = np.random.default_rng(self.seed)

    def _build_train_step(self):
        optimizer = self.optimizer

        def train_step(state, inp, target, rng, lr, mask=None):
            def loss_fn(params):
                out, new_bs = self._apply(
                    params, state.batch_stats, inp, True, rng)
                loss = masked_mse_loss(out, target, mask)
                return loss.astype(np.float32), (out, new_bs)

            import jax.numpy as jnp
            import optax
            (loss, (out, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            opt_state = state.opt_state
            if hasattr(opt_state, "hyperparams"):
                opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = optimizer.update(
                grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            from elektronn3_tpu.training.trainer import TrainState
            new_state = TrainState(params=params, batch_stats=new_bs,
                                   opt_state=opt_state,
                                   step=state.step + 1)
            return new_state, loss, out

        return jax.jit(train_step, donate_argnums=(0,))

    def _train(self, max_steps, max_runtime):
        """Epoch loop with on-the-fly N2V masking (reference
        noise2void.py:115-154)."""
        from elektronn3_tpu.data.pipeline import DataLoader
        import jax.numpy as jnp

        stats = {"tr_loss": []}
        misc = {}
        running_vx_size = 0
        from elektronn3_tpu.training.train_utils import Timer
        timer = Timer()
        loader = DataLoader(
            self.train_dataset, batch_size=self.batch_size,
            num_workers=self.num_workers, seed=self.seed,
            channels_last=False)
        pending_loss = None
        for batch in loader:
            raw = np.asarray(batch["inp"])  # (N, C, *spatial)
            masked = np.empty_like(raw)
            target = np.empty_like(raw)
            mask = np.empty_like(raw, dtype=np.float32)
            for n in range(raw.shape[0]):
                masked[n], target[n], mask[n] = prepare_sample(
                    raw[n], self.n2v_ratio, rng=self._n2v_rng)
            # channels-last for the device
            inp_cl = jnp.asarray(np.moveaxis(masked, 1, -1))
            tgt_cl = jnp.asarray(np.moveaxis(target, 1, -1))
            msk_cl = jnp.asarray(np.moveaxis(mask, 1, -1))
            lr = self.lr_scheduler.get_lr()
            self._rng, step_rng = jax.random.split(self._rng)
            self.state, loss, out = self._train_step_jit(
                self.state, inp_cl, tgt_cl, step_rng,
                jnp.asarray(lr, jnp.float32), msk_cl)
            if pending_loss is not None:
                lval = float(pending_loss)
                stats["tr_loss"].append(lval)
                if np.isnan(lval):
                    from elektronn3_tpu.training.trainer import NaNException
                    raise NaNException("NaN loss detected!")
            pending_loss = loss
            self.step += 1
            running_vx_size += int(np.prod(raw.shape))
            self._scheduler_step(loss)
            if self.step >= max_steps:
                self.terminate = True
            if self.start_time.t_passed >= max_runtime:
                self.terminate = True
            if self.terminate:
                break
        if pending_loss is not None:
            stats["tr_loss"].append(float(pending_loss))
        t = timer.t_passed
        misc["tr_speed"] = max(len(stats["tr_loss"]), 1) / t
        misc["tr_speed_vx"] = running_vx_size / t / 1e6
        misc["learning_rate"] = self.lr_scheduler.get_lr()
        stats["tr_loss_mean"] = float(np.mean(stats["tr_loss"])) \
            if stats["tr_loss"] else float("nan")
        return stats, misc

    def _validate(self):
        """Masked-MSE validation (reference noise2void.py:155-223)."""
        from elektronn3_tpu.data.pipeline import DataLoader
        import jax.numpy as jnp
        if self.valid_dataset is None:
            return {}
        loader = DataLoader(
            self.valid_dataset, batch_size=self.batch_size,
            num_workers=0, shuffle=False, seed=self.seed,
            drop_last=False, channels_last=False)
        losses = []
        rng = np.random.default_rng(0)
        for batch in loader:
            raw = np.asarray(batch["inp"])
            masked = np.empty_like(raw)
            target = np.empty_like(raw)
            mask = np.empty_like(raw, dtype=np.float32)
            for n in range(raw.shape[0]):
                masked[n], target[n], mask[n] = prepare_sample(
                    raw[n], self.n2v_ratio, rng=rng)
            inp_cl = jnp.asarray(np.moveaxis(masked, 1, -1))
            out = self.model.apply(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats}
                if self.state.batch_stats else
                {"params": self.state.params},
                inp_cl, train=False)
            loss = masked_mse_loss(
                out, jnp.asarray(np.moveaxis(target, 1, -1)),
                jnp.asarray(np.moveaxis(mask, 1, -1)))
            losses.append(float(loss))
        return {"val_loss": float(np.mean(losses)) if losses
                else float("nan")}


class _N2VCriterion:
    """Placeholder criterion (the real loss is computed in the custom
    train step with the mask)."""

    def __call__(self, out, target):
        return masked_mse_loss(out, target, None)
