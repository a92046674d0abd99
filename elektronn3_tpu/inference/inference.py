"""Inference engine: tiled overlap prediction for arbitrarily large
volumes.

Re-design of the reference inference engine
(elektronn3/inference/inference.py):
- tiled_apply (:45-199): the reference runs tiles sequentially through
  the model. Here the tile grid is *batched*: all tiles have one static
  shape, so there is exactly ONE compiled forward program; tiles are
  packed into batches of ``batch_size`` and streamed through the device
  while output crops are scattered into the preallocated host output.
- Predictor (:246-710): model loading, softmax/argmax heads, flip-TTA
  averaging (:215-243), auto-padding for non-divisible shapes
  (:645-696), valid-conv offset handling (:476-489), MVox/s reporting
  (:636-641).

Layout: the public API accepts/returns channels-FIRST numpy arrays
((N, C, *spatial)), matching the reference's interface so existing
pipelines drop in; internally everything is converted once to
channels-last for the TPU.
"""

from __future__ import annotations

import itertools
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from elektronn3_tpu import logger


def _extend_nc(spatial_slice: Sequence[slice]) -> Tuple[slice, ...]:
    """Extend a spatial slice tuple with (N, C) slice(None)s in front.
    Reference inference.py:36-42."""
    return (slice(None), slice(None)) + tuple(spatial_slice)


def tiled_apply(
        func: Callable[[np.ndarray], np.ndarray],
        inp: np.ndarray,
        tile_shape: Sequence[int],
        overlap_shape: Sequence[int],
        offset: Optional[Sequence[int]],
        out_shape: Sequence[int],
        verbose: bool = False,
        phase_times: Optional[Dict[str, float]] = None,
        device_crop: bool = False,
        max_tiles_per_call: Optional[int] = None,
        out_dtype=np.float32,
) -> np.ndarray:
    """Apply ``func`` tile-wise over a large (N, C, *spatial) input.

    ``func`` maps an (N, C, *tile_in_spatial) array to
    (N, C_out, *tile_out_spatial). ``tile_shape`` is the *output* tile
    spatial shape; each input tile is extended by ``overlap_shape`` on
    both sides. ``offset`` accounts for valid-conv shrinkage: the model
    output is smaller than its input by 2*offset, so only
    ``overlap - offset`` is cropped from the raw output.

    ``device_crop``: ``func`` accepts ``crop_lo``/``crop_size`` kwargs
    and returns already-cropped core tiles. With 'same'-mode overlap
    the raw tile output is ``prod(1 + 2*overlap/tile)`` times the core
    (8x at the reference example's tile=2*overlap shapes) — cropping
    before the device->host copy removes that factor from the D2H
    bytes, which dominate tiled e2e on relay/PCIe-bound hosts
    (measured v5e-relay: 92 of 112 s in D2H before this).
    ``max_tiles_per_call``: explicit tiles-per-device-call override
    (Predictor ``batch_size``). The default budget (~64 MB of f32
    input voxels per call) is deliberately conservative: it is a proxy
    for ACTIVATION memory, which dominates — a bf16-ship-bytes budget
    packed 3 of the reference example's 8.4-MVox tiles and OOM'd the
    v5e's 16 GB HBM at 18.95 GB.

    Semantics parity with reference tiled_apply (inference.py:45-199);
    execution is batched per-tile-grid rather than sequential.
    """
    if np.any(np.mod(out_shape[2:], tile_shape)):
        raise ValueError(
            f"spatial out_shape {tuple(out_shape[2:])} has to be divisible "
            f"by tile_shape {tuple(tile_shape)}.")
    inp_shape = np.array(inp.shape)
    out_shape = np.array(out_shape)
    tile_shape = np.array(tile_shape)
    overlap_shape = np.array(overlap_shape)

    if np.array_equal(out_shape[2:], inp_shape[2:]):
        # Same-conv case: zero-pad the input spatially by overlap
        # (reference :137-151); model outputs are cropped by overlap.
        padded_shape = inp_shape.copy()
        padded_shape[2:] += 2 * overlap_shape
        inp_padded = np.zeros(padded_shape, dtype=inp.dtype)
        padslice = _extend_nc(
            [slice(o, o + s) for o, s in zip(overlap_shape, inp_shape[2:])])
        inp_padded[padslice] = inp
        crop_low = overlap_shape.copy()
        if offset is not None:
            # Valid-conv semantics on an unshrunk out_shape can't happen
            # here; offset is only meaningful when out < inp.
            crop_low = overlap_shape - np.array(offset)
            if np.any(crop_low < 0):
                raise ValueError(
                    "overlap_shape must be >= offset in every dim")
    else:
        # Valid-conv case (reference :135-136, :152-153): the input is
        # already 2*offset larger than the output; the model itself eats
        # the overlap, so no padding and no output crop. This requires
        # overlap_shape == offset.
        if offset is None or not np.array_equal(overlap_shape,
                                                np.array(offset)):
            raise ValueError(
                "With out_shape smaller than inp shape (valid-conv mode), "
                "overlap_shape must equal offset "
                f"(got overlap={tuple(overlap_shape)}, offset={offset}).")
        inp_padded = inp
        crop_low = np.zeros_like(tile_shape)
    del inp

    out = np.empty(out_shape, dtype=out_dtype)
    tiles = np.ceil(out_shape[2:] / tile_shape).astype(int)
    tile_positions = [np.array(p) for p in itertools.product(
        *[range(t) for t in tiles])]
    num_tiles = len(tile_positions)
    n = inp_padded.shape[0]
    t0 = time.time()

    # Batched tile execution: all tiles share one static shape, so they
    # are packed along the batch axis and streamed through the device in
    # large batches — ONE compiled program, few host-device round trips
    # (the reference runs tiles one by one, inference.py:165-197).
    tile_batch: list = []
    positions_batch: list = []
    # Per-call batch target: ~64 MB of input tiles.
    in_tile_spatial = tile_shape + 2 * overlap_shape
    tile_bytes = (n * inp_padded.shape[1]
                  * int(np.prod(in_tile_spatial)) * 4)
    max_batch_tiles = max(1, int(64e6 // max(tile_bytes, 1)))
    if max_tiles_per_call is not None:
        max_batch_tiles = max(1, int(max_tiles_per_call))
    crop_kw = {}
    if device_crop and np.any(crop_low > 0):
        crop_kw = dict(crop_lo=tuple(int(c) for c in crop_low),
                       crop_size=tuple(int(t) for t in tile_shape))

    def flush():
        if not tile_batch:
            return
        ta = time.time()
        stacked = np.concatenate(tile_batch)  # (B*n, C, *in_tile)
        tb = time.time()
        res = np.asarray(func(stacked, **crop_kw))
        tc = time.time()
        if not crop_kw and np.any(crop_low > 0):
            res = res[_extend_nc(
                [slice(c, c + t) for c, t in zip(crop_low, tile_shape)])]
        for bi, pos in enumerate(positions_batch):
            out_lo = pos * tile_shape
            out_hi = out_lo + tile_shape
            out[_extend_nc([slice(lo, hi)
                            for lo, hi in zip(out_lo, out_hi)])] = \
                res[bi * n:(bi + 1) * n]
        if phase_times is not None:
            td = time.time()
            phase_times["host_assemble"] = \
                phase_times.get("host_assemble", 0.0) + (tb - ta)
            phase_times["device_call"] = \
                phase_times.get("device_call", 0.0) + (tc - tb)
            phase_times["host_scatter"] = \
                phase_times.get("host_scatter", 0.0) + (td - tc)
        tile_batch.clear()
        positions_batch.clear()

    for i, tile_pos in enumerate(tile_positions):
        out_lo = tile_pos * tile_shape
        out_hi = out_lo + tile_shape
        # Input tile in padded space: output region + overlap on both
        # sides (offset is *inside* the overlap).
        in_lo = out_lo
        in_hi = out_hi + 2 * overlap_shape
        tile_batch.append(inp_padded[_extend_nc(
            [slice(lo, hi) for lo, hi in zip(in_lo, in_hi)])])
        positions_batch.append(tile_pos)
        if len(tile_batch) >= max_batch_tiles:
            flush()
            if verbose:
                logger.info(f"tiled_apply: {i + 1}/{num_tiles} tiles "
                            f"({time.time() - t0:.1f} s)")
    flush()
    return out


DEFAULT_AUGMENTATIONS_3D = [
    (), (2,), (3,), (4,), (2, 3), (2, 4), (3, 4), (2, 3, 4)]
DEFAULT_AUGMENTATIONS_2D = [(), (2,), (3,), (2, 3)]


class Predictor:
    """End-to-end deployment: tiled, batched inference on large inputs.

    Args (parity with reference Predictor, inference.py:246-494):
        model: a flax Module, a path to a ``.e3tpu``/``state_dict.ckpt``
            file, or a callable ``(N, *spatial, C) -> (N, *spatial, C')``.
        state: flax variables dict ({'params': ..., 'batch_stats': ...})
            if ``model`` is a Module.
        device: ignored (kept for API parity).
        batch_size: maximum batch of tiles on the device at once.
        tile_shape: spatial shape of output tiles. None = whole input.
        overlap_shape: tile overlap; should cover the model's effective
            receptive-field halo.
        offset: valid-conv output shrinkage per side. Auto-probed if
            ``float16``... (see reference :476-489); here: probe with a
            zeros forward pass when ``offset='auto'``.
        out_shape: full output shape (N, C_out, *spatial). If None,
            inferred as input spatial shape with ``out_channels``.
        out_channels: number of output channels.
        out_dtype: dtype the output is cast to ON DEVICE, before the
            device->host copy (reference inference.py:324,378,523-524 —
            there the cast is ``dout.to(self.out_dtype)`` right before
            the implicit copy). Defaults (reference :455-456,613-615):
            uint8 when an argmax head is active (class ids; guarded
            against >255 classes), else the compute dtype (bfloat16
            under ``float16=True``, float32 otherwise — the reference
            returns half under its fp16 mode). Casting before D2H is a
            first-class perf lever on relay/PCIe-bound hosts: uint8
            argmax output ships 8x fewer bytes than f32 probabilities,
            bf16 probabilities 2x (measured: d2h was 11.9 of 29.7 s on
            the v5e relay at f32). Accepts anything ``np.dtype`` does,
            plus 'bfloat16' (ml_dtypes).
        float16: use bf16 compute (TPU equivalent of the reference's
            fp16 mode).
        apply_softmax: append a softmax head (reference :443-454).
        argmax_with_threshold: append argmax head; if a float is given,
            class 1 fires only above the threshold (binary case).
        transform: applied to each input sample before prediction.
        augmentations: flip-TTA spec — list of axis-tuples (NCDHW axis
            ids as in the reference, :215-243) or int N to take the
            first N defaults; predictions are averaged.
        strict_shapes: if False (default), auto-pad non-divisible inputs
            and crop the result back (reference :645-696).
        verbose: log MVox/s throughput.
    """

    def __init__(
            self,
            model,
            state: Optional[Dict[str, Any]] = None,
            device=None,
            batch_size: Optional[int] = None,
            tile_shape: Optional[Sequence[int]] = None,
            overlap_shape: Optional[Sequence[int]] = None,
            offset: Union[None, str, Sequence[int]] = None,
            out_shape: Optional[Sequence[int]] = None,
            out_channels: Optional[int] = None,
            out_dtype=None,
            float16: bool = False,
            apply_softmax: bool = True,
            transform: Optional[Callable] = None,
            augmentations: Union[int, Sequence, None] = None,
            argmax_with_threshold: Union[None, bool, float] = None,
            strict_shapes: bool = False,
            verbose: bool = False,
            collect_phase_times: bool = False,
            mesh=None,
            shard_mode: str = "spatial",
            shard_axis: int = 2,
            halo: Optional[int] = None,
    ):
        self.batch_size = batch_size
        self.tile_shape = None if tile_shape is None else tuple(tile_shape)
        self.overlap_shape = None if overlap_shape is None \
            else tuple(overlap_shape)
        self.out_shape = None if out_shape is None else tuple(out_shape)
        self.out_channels = out_channels
        self.float16 = float16
        self.apply_softmax = apply_softmax
        self.transform = transform
        self.argmax_with_threshold = argmax_with_threshold
        argmax_on = argmax_with_threshold is not None \
            and argmax_with_threshold is not False
        if out_dtype is None:
            # Reference defaults (inference.py:455-456,613-615): uint8
            # for argmax class ids, else the compute dtype.
            if argmax_on:
                out_dtype = np.uint8
            elif float16:
                import ml_dtypes
                out_dtype = ml_dtypes.bfloat16
            else:
                out_dtype = np.float32
        elif out_dtype == "bfloat16":
            import ml_dtypes
            out_dtype = ml_dtypes.bfloat16
        self.out_dtype = np.dtype(out_dtype)
        self._argmax_on = argmax_on
        self.strict_shapes = strict_shapes
        self.verbose = verbose
        # Opt-in per-phase wall-time attribution (host_assemble / h2d /
        # compute / d2h / host_scatter), populated per predict() call.
        # Adds one tiny sync fetch per device call when enabled — leave
        # off in production.
        self.collect_phase_times = collect_phase_times
        self.last_phase_times: Optional[Dict[str, float]] = None
        # Integer specs are resolved per call from the input rank (the
        # 2D vs 3D default table depends on it) — never written back,
        # so one Predictor is shareable across volumes of any rank.
        self.augmentations = augmentations

        # Resolve the model into an apply callable on channels-last
        if isinstance(model, str) and model.endswith(".stablehlo"):
            from elektronn3_tpu.training.trainer import load_stablehlo
            model = load_stablehlo(model)
        elif isinstance(model, str):
            from elektronn3_tpu.training.trainer import load_model
            model, state, info = load_model(model)
            if self.out_channels is None:
                self.out_channels = getattr(model, "out_channels", None)
        if callable(model) and not hasattr(model, "apply"):
            self._apply_fn = model
        else:
            assert state is not None, \
                "state (variables dict) required with a flax Module"
            if isinstance(state, str):
                # Reference torch checkpoint (state_dict*.pth /
                # model*.pt / TorchScript model*.pts, reference
                # inference.py:418-440): convert into flax variables
                # for this model (models/torch_import.py).
                from elektronn3_tpu.models.torch_import import \
                    load_torch_state_dict
                state = load_torch_state_dict(
                    state, model,
                    example_input_shape=self._probe_shape(model))
            variables = dict(state)
            mdl = model
            if self.out_channels is None:
                self.out_channels = getattr(mdl, "out_channels", None)

            def apply_fn(x):
                return mdl.apply(variables, x, train=False)

            self._apply_fn = apply_fn
        self.model = model

        if offset == "auto":
            offset = None  # probed lazily on first predict
            self._auto_offset = True
        else:
            self._auto_offset = False
        self.offset = None if offset is None else tuple(offset)
        # Auto-probed offsets, keyed by input rank (the conv shrinkage
        # is rank-dependent but shape-independent); written only after a
        # successful probe so a failed predict leaves no stale state.
        self._offset_by_rank: Dict[int, Tuple[int, ...]] = {}

        # Multi-chip sharding (SURVEY.md §7 step 6):
        # - shard_mode='spatial': shard one spatial axis of the volume
        #   over the mesh's 'space' axis with ppermute halo exchange
        #   (elektronn3_tpu.parallel.halo). Requires a same-conv model;
        #   ``halo`` must cover the receptive-field half width.
        # - shard_mode='tiles': shard the batched TILE GRID over the
        #   mesh's 'data' axis — tiled_apply packs tiles along the batch
        #   dim, so each device runs an equal slice of the tile batch
        #   (the TPU-native replacement for the reference's
        #   InferenceModel(multi_gpu=True) DataParallel path,
        #   models/base.py:48-50). No halo needed; flip-TTA works.
        self.mesh = mesh
        self.shard_mode = shard_mode
        self.shard_axis = shard_axis
        self.halo = halo
        self._n_shards = 1
        self._crop_on_device = False   # spatial sharding: host crop
        if mesh is not None and shard_mode == "spatial":
            if halo is None:
                raise ValueError("halo is required with spatial sharding")
            if self.augmentations:
                raise ValueError(
                    "flip-TTA is not supported with spatial mesh "
                    "sharding (flips across the sharded axis would be "
                    "device-local)")
            from elektronn3_tpu.parallel.halo import sharded_spatial_apply
            # shard_axis is in NC(D)HW terms (like tile axes); on the
            # channels-last device layout spatial axis k maps to k-1.
            self._jit_forward = jax.jit(sharded_spatial_apply(
                self._forward_cl, mesh, halo,
                spatial_axis=shard_axis - 1, axis_name="space"))
        elif mesh is not None and shard_mode == "tiles":
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._n_shards = mesh.shape["data"]
            self._jit_forward = jax.jit(
                self._forward_crop, static_argnums=(1, 2),
                in_shardings=NamedSharding(mesh, P("data")),
                out_shardings=NamedSharding(mesh, P("data")))
            self._crop_on_device = True
        elif mesh is not None:
            raise ValueError(
                f"shard_mode must be 'spatial' or 'tiles', "
                f"got {shard_mode!r}")
        else:
            self._jit_forward = jax.jit(self._forward_crop,
                                        static_argnums=(1, 2))
            self._crop_on_device = True

    @staticmethod
    def _probe_shape(model):
        """A minimal valid channels-last input shape for initializing a
        model's parameter template (shapes only — values are zeros)."""
        dim = getattr(model, "dim", 3)
        n_blocks = getattr(model, "n_blocks", 4)
        in_ch = getattr(model, "in_channels", 1)
        s = 2 ** max(int(n_blocks), 1)
        if getattr(model, "conv_mode", "same") == "valid":
            s *= 8  # headroom for per-level conv shrinkage
        return (1,) + (s,) * int(dim) + (int(in_ch),)

    # -- device-side forward on channels-last tiles ---------------------

    def _resolve_augmentations(self, ndim: int):
        """Resolve an int TTA spec against the input rank (N,C,*spatial
        ndim == channels-last ndim). Pure — no instance mutation, so the
        jit trace cache (keyed on input shape/rank) stays consistent."""
        aug = self.augmentations
        if isinstance(aug, int):
            defaults = (DEFAULT_AUGMENTATIONS_3D if ndim >= 5
                        else DEFAULT_AUGMENTATIONS_2D)
            aug = defaults[:aug]
        return aug or ()

    def _forward_cl(self, x_cl: jnp.ndarray) -> jnp.ndarray:
        if self.float16:
            x_cl = x_cl.astype(jnp.bfloat16)
        out = self._apply_fn(x_cl)
        augmentations = self._resolve_augmentations(x_cl.ndim)
        if augmentations:
            # Flip-TTA: average predictions over spatial-flip variants
            # (reference FlipAugment, inference.py:215-243). Axis ids in
            # the spec are NC(D)HW-based; convert to channels-last.
            n_total = out.astype(jnp.float32)
            for axes in augmentations:
                if not axes:
                    continue
                cl_axes = tuple(a - 1 for a in axes)  # NCDHW ax -> NDHWC ax
                flipped = jnp.flip(x_cl, cl_axes)
                o = self._apply_fn(flipped)
                o = jnp.flip(o, cl_axes)
                n_total = n_total + o.astype(jnp.float32)
            out = n_total / (1 + sum(1 for a in augmentations if a))
        out = out.astype(jnp.float32)
        if self.apply_softmax:
            out = jax.nn.softmax(out, axis=-1)
        if self._argmax_on:
            if self.argmax_with_threshold is True:
                out = jnp.argmax(out, axis=-1, keepdims=True)
            else:
                out = out[..., 1:2] > self.argmax_with_threshold
        # Cast to out_dtype ON DEVICE so the D2H copy ships the small
        # representation (reference inference.py:523-524; uint8 argmax
        # is 8x fewer bytes than f32 probabilities).
        return out.astype(self.out_dtype)

    def _forward_crop(self, x_cl: jnp.ndarray,
                      crop_lo: Optional[Tuple[int, ...]] = None,
                      crop_size: Optional[Tuple[int, ...]] = None):
        """Forward + static center-crop ON DEVICE. tiled_apply's 'same'
        mode discards the 2*overlap border of every tile output; doing
        the crop before the D2H copy shrinks the dominant tiled-predict
        phase (measured v5e-relay, (64,128,128)+(32,64,64) tiles: D2H
        was 82% of e2e at 8x redundant bytes)."""
        out = self._forward_cl(x_cl)
        if crop_lo is not None:
            sl = ((slice(None),)
                  + tuple(slice(lo, lo + sz)
                          for lo, sz in zip(crop_lo, crop_size))
                  + (slice(None),))
            out = out[sl]
        return out

    def _predict(self, inp_ncf: np.ndarray,
                 crop_lo: Optional[Tuple[int, ...]] = None,
                 crop_size: Optional[Tuple[int, ...]] = None) -> np.ndarray:
        """Forward an (N, C, *spatial) numpy batch → (N, C', *spatial')
        numpy (device roundtrip)."""
        n = inp_ncf.shape[0]
        host_crop = None
        if crop_lo is not None and not self._crop_on_device:
            host_crop = _extend_nc([slice(lo, lo + sz) for lo, sz
                                    in zip(crop_lo, crop_size)])
            crop_lo = crop_size = None
        if self._n_shards > 1 and n % self._n_shards:
            # tile-grid sharding needs an even batch split: pad with
            # repeats of the last tile and drop them afterwards.
            pad = self._n_shards - n % self._n_shards
            inp_ncf = np.concatenate(
                [inp_ncf] + [inp_ncf[-1:]] * pad)
        host = np.ascontiguousarray(np.moveaxis(inp_ncf, 1, -1))
        if self.float16:
            # Ship bf16: the forward casts to bf16 on device anyway
            # (_forward_cl), so converting on the host first HALVES the
            # H2D bytes at identical numerics — on relay/PCIe-bound
            # hosts the transfer is the tiled-inference bottleneck.
            import ml_dtypes
            host = host.astype(ml_dtypes.bfloat16)
        fwd_args = ((crop_lo, crop_size) if self._crop_on_device
                    else ())
        if self.last_phase_times is None:
            x_cl = jnp.asarray(host)
            out = self._jit_forward(x_cl, *fwd_args)
            res = np.moveaxis(np.asarray(out), -1, 1)[:n]
            return res[host_crop] if host_crop else res
        pt = self.last_phase_times
        t0 = time.time()
        x_cl = jax.block_until_ready(jnp.asarray(host))
        t1 = time.time()
        out = self._jit_forward(x_cl, *fwd_args)
        # relay-safe device sync: a 1-element fetch (block_until_ready
        # may not truly block through axon; CLAUDE.md)
        float(out.ravel()[0])
        t2 = time.time()
        res = np.moveaxis(np.asarray(out), -1, 1)[:n]
        t3 = time.time()
        pt["h2d"] = pt.get("h2d", 0.0) + (t1 - t0)
        pt["compute"] = pt.get("compute", 0.0) + (t2 - t1)
        pt["d2h"] = pt.get("d2h", 0.0) + (t3 - t2)
        return res[host_crop] if host_crop else res

    # -- public API ------------------------------------------------------

    def predict(self, inp: np.ndarray) -> np.ndarray:
        """Predict on a (N, C, *spatial) / (C, *spatial) / (*spatial)
        numpy array; returns (N, C_out, *spatial_out) in ``out_dtype``
        (uint8 class ids with an argmax head, bf16/f32 probabilities
        otherwise). Reference Predictor.predict (inference.py:569-642)."""
        start = time.time()
        self.last_phase_times = {} if self.collect_phase_times else None
        inp = np.asarray(inp, np.float32)
        spatial_ndim = None
        if self.tile_shape is not None:
            spatial_ndim = len(self.tile_shape)
        # Normalize to (N, C, *spatial)
        if spatial_ndim is not None:
            while inp.ndim < spatial_ndim + 2:
                inp = inp[None]
        elif inp.ndim in (3, 4) and self.out_shape is not None:
            while inp.ndim < len(self.out_shape):
                inp = inp[None]

        augmentations = self._resolve_augmentations(inp.ndim)
        if augmentations:
            # Axis ids are NC(D)HW-based; spatial axes are 2..ndim-1.
            for axes in augmentations:
                bad = [a for a in axes if not 2 <= a < inp.ndim]
                if bad:
                    raise ValueError(
                        f"TTA augmentation axes {axes} contain "
                        f"non-spatial axis ids {bad} for a {inp.ndim}-d "
                        "(N, C, *spatial) input")

        if self.transform is not None:
            tr = []
            for n in range(inp.shape[0]):
                t, _ = self.transform(inp[n], None)
                tr.append(t)
            inp = np.stack(tr)

        offset_spec = self.offset
        if self._auto_offset and offset_spec is None:
            offset_spec = self._offset_by_rank.get(inp.ndim)
            if offset_spec is None:
                probe = np.zeros_like(inp[:1])
                pout = self._predict(probe)
                offset_spec = tuple(
                    (np.array(inp.shape[2:])
                     - np.array(pout.shape[2:])) // 2)
                self._offset_by_rank[inp.ndim] = offset_spec
                logger.info(f"Auto-detected offset: {offset_spec}")

        out_channels = self.out_channels
        if out_channels is None:
            probe = self._predict(np.zeros_like(inp[:1]))
            out_channels = probe.shape[1]
            self.out_channels = out_channels
        if (self._argmax_on and self.out_dtype == np.uint8
                and out_channels is not None and out_channels > 255):
            # Reference inference.py:613-615: uint8 can't hold the
            # class ids of a >255-class argmax output.
            raise ValueError(
                f"out_channels = {out_channels}, but out_dtype uint8 "
                "can only hold class ids up to 255.")

        offset = np.zeros(inp.ndim - 2, np.int64) if offset_spec is None \
            else np.array(offset_spec)
        out_spatial = np.array(inp.shape[2:]) - 2 * offset
        # An argmax head collapses the class axis to ONE channel of ids
        # (out_channels keeps meaning the model's class count, which the
        # uint8 guard above needs).
        head_channels = 1 if self._argmax_on else out_channels
        out_shape = np.array(
            (inp.shape[0], head_channels, *out_spatial))

        if self.tile_shape is None:
            # Single-shot prediction
            out = self._splitbatch_predict(inp)
        else:
            tile_shape = np.array(self.tile_shape)
            if np.any(offset > 0):
                # Valid-conv mode: the model itself consumes the halo, so
                # the effective overlap IS the offset (reference :152-153).
                overlap = offset.copy()
            elif self.overlap_shape is None:
                overlap = np.zeros_like(tile_shape)
            else:
                overlap = np.array(self.overlap_shape)
            # Auto-pad non-divisible shapes (reference :645-696)
            remainder = (-out_spatial) % tile_shape
            if np.any(remainder):
                if self.strict_shapes:
                    raise ValueError(
                        f"Output spatial shape {tuple(out_spatial)} is not "
                        f"divisible by tile shape {tuple(tile_shape)}. Pass "
                        "strict_shapes=False to auto-pad.")
                pad = [(0, 0), (0, 0)] + [(0, int(r)) for r in remainder]
                inp = np.pad(inp, pad)
                padded_out_shape = out_shape.copy()
                padded_out_shape[2:] += remainder
                out = self._tiled_predict(inp, tile_shape, overlap,
                                          offset, padded_out_shape)
                out = out[_extend_nc([slice(0, s) for s in out_spatial])]
            else:
                out = self._tiled_predict(inp, tile_shape, overlap,
                                          offset, out_shape)

        if self.verbose:
            dt = time.time() - start
            mvx = np.prod(out.shape[2:]) * out.shape[0] / dt / 1e6
            logger.info(f"Prediction done in {dt:.2f} s ({mvx:.2f} MVox/s)")
        return out

    def predict_proba(self, inp):  # API parity (reference :694)
        return self.predict(inp)

    def _tiled_predict(self, inp, tile_shape, overlap, offset, out_shape):
        return tiled_apply(
            self._splitbatch_predict, inp, tile_shape, overlap,
            offset, out_shape, verbose=self.verbose,
            phase_times=self.last_phase_times,
            device_crop=True,
            max_tiles_per_call=self.batch_size,
            out_dtype=self.out_dtype)

    def _splitbatch_predict(self, inp: np.ndarray, **crop_kw) -> np.ndarray:
        """Split over-long batches (reference :552-567).

        The final ragged chunk is zero-padded to the full batch size so
        every device call shares ONE compiled shape."""
        n = inp.shape[0]
        bs = self.batch_size or n
        if n <= bs:
            return self._predict(inp, **crop_kw)
        outs = []
        for i in range(0, n, bs):
            chunk = inp[i:i + bs]
            pad = bs - chunk.shape[0]
            if pad > 0:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)])
            res = self._predict(chunk, **crop_kw)
            if pad > 0:
                res = res[:res.shape[0] - pad]
            outs.append(res)
        return np.concatenate(outs)
