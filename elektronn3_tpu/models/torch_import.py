"""Import reference (PyTorch) checkpoints into flax models.

Completes the drop-in migration story (docs/MIGRATION.md): users of the
reference hold ``state_dict*.pth`` bundles (torch.save dict with a
'model_state_dict' entry, reference trainer.py:845-869), bare
state_dicts, pickled ``model*.pt`` modules, or TorchScript
``model*.pts`` archives (the reference Predictor's full artifact
triple, reference inference.py:418-440); :func:`load_torch_state_dict`
converts any of them into a flax ``variables`` dict for the
corresponding ``elektronn3_tpu`` model (UNet and ResUNet layouts).

Name translation (torch module path -> flax variable path):

    down_convs.{i}   -> down_{i}          up_convs.{i} -> up_{i}
    convs.{j}        -> conv_{j}          (ResUNet ConvBlock stacks)
    conv1/conv2/upconv/proj/conv_final    (unchanged)
    norm{k}          -> k-th norm module of the flax block (BatchNorm_n /
                        GroupNorm_n ..., matched by order — robust to
                        full_norm=False gaps, reference unet.py:238-242)

Tensor conversion: conv ``weight`` (O, I, *s) -> flax ``kernel``
(*s, I, O); ConvTranspose ``weight`` (I, O, *s) additionally has its
spatial taps flipped (torch's transposed conv correlates with flipped
kernels relative to flax ConvTranspose); norm ``weight``/``bias`` ->
``scale``/``bias`` params, ``running_mean``/``running_var`` ->
``batch_stats`` ``mean``/``var``; ``num_batches_tracked`` is dropped.
``module.`` DataParallel prefixes are stripped (reference
inference.py:698-710 set_state_dict).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from elektronn3_tpu import logger

_NORM_RE = re.compile(r"^(?:Batch|Group|Layer|Instance)Norm_(\d+)$")


def _flatten(tree: Dict, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if hasattr(v, "keys"):
            out.update(_flatten(v, prefix + (str(k),)))
        else:
            out[prefix + (str(k),)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _to_flax_conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, *spatial) -> flax kernel (*spatial, I, O)."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _to_flax_convtranspose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose weight (I, O, *spatial) -> flax kernel
    (*spatial, I, O), un-flipping the spatial taps (inverse of the
    transplant in tests/test_reference_parity.py)."""
    nd = w.ndim
    w = np.flip(w, axis=tuple(range(2, nd)))
    return np.transpose(w, tuple(range(2, nd)) + (0, 1)).copy()


def _structural_rename(parts: Tuple[str, ...]) -> Tuple[str, ...]:
    """Translate torch module-path tokens into flax module names
    (norm indices are resolved separately, by order)."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("down_convs", "up_convs") and i + 1 < len(parts):
            out.append(("down_" if p == "down_convs" else "up_")
                       + parts[i + 1])
            i += 2
        elif p == "convs" and i + 1 < len(parts):
            out.append("conv_" + parts[i + 1])
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def load_torch_state_dict(src, model, example_input_shape=None,
                          variables: Optional[Dict] = None,
                          strict: bool = True) -> Dict[str, Any]:
    """Convert a reference torch checkpoint into flax ``variables``.

    Args:
        src: path to a ``state_dict*.pth`` / ``model*.pt`` file, or an
            already-loaded torch state_dict (dict of tensors).
        model: the flax Module the weights are destined for (used to
            build the target variable template).
        example_input_shape: channels-last input shape for initializing
            the template when ``variables`` is not given.
        variables: optional existing variables dict used as the target
            template (overrides example_input_shape).
        strict: raise on missing/mismatched parameters instead of
            warning.

    Returns:
        A variables dict (``{'params': ..., 'batch_stats': ...}``) with
        every leaf filled from the checkpoint.
    """
    import jax
    import jax.numpy as jnp

    # --- resolve the source into a flat {name: np.ndarray} state dict
    if isinstance(src, str):
        import torch
        if src.endswith(".pts"):
            # TorchScript archive (reference trainer.py:876-887
            # save_jit; consumed by reference inference.py:418-440) —
            # torch.jit.load exposes the module's state_dict, which
            # feeds the same rename map as .pth/.pt below.
            obj = torch.jit.load(src, map_location="cpu")
        else:
            try:
                obj = torch.load(src, map_location="cpu",
                                 weights_only=False)
            except RuntimeError:
                # A TorchScript zip saved under a non-.pts name.
                obj = torch.jit.load(src, map_location="cpu")
        if hasattr(obj, "state_dict"):  # nn.Module / ScriptModule
            obj = obj.state_dict()
        if isinstance(obj, dict) and "model_state_dict" in obj:
            obj = obj["model_state_dict"]
        state_dict = obj
    elif hasattr(src, "state_dict"):
        state_dict = src.state_dict()
    else:
        state_dict = src
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):  # DataParallel wrapper
            k = k[len("module."):]
        sd[k] = np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                           if hasattr(v, "cpu") else v)

    # --- build the flax target template
    if variables is None:
        if example_input_shape is None:
            raise ValueError(
                "Provide example_input_shape or variables to build the "
                "flax parameter template.")
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros(tuple(example_input_shape), jnp.float32),
            train=False)
    params_flat = _flatten(dict(variables.get("params", {})))
    bs_flat = _flatten(dict(variables.get("batch_stats", {})))

    # ResUNet layout resolution: a res_blocks=0 ResUNet delegates to
    # the UNet forward (models/resunet.py), so its flax tree has no
    # conv_{j} ConvBlock nesting — but the reference resunet ALWAYS
    # wraps its single ConvBlock in a Sequential (``convs.0``,
    # reference resunet.py:288-298). When the target template has no
    # conv_{j} modules, collapse the (sole) ``conv_0`` token so
    # ``down_convs.0.convs.0.conv1`` lands on ``down_0/conv1``.
    template_has_convn = any(
        any(re.fullmatch(r"conv_\d+", c) for c in path)
        for path in params_flat)

    def _rename(key: str) -> Tuple[str, ...]:
        parts = _structural_rename(tuple(key.split(".")))
        if not template_has_convn:
            parts = tuple(p for p in parts if p != "conv_0")
        return parts

    # --- norm-slot resolution: per flax parent, norm modules by order
    norm_slots: Dict[Tuple[str, ...], list] = {}
    for path in params_flat:
        for d in range(len(path) - 1):
            m = _NORM_RE.match(path[d])
            if m:
                parent, name = path[:d], path[d]
                lst = norm_slots.setdefault(parent, [])
                if name not in lst:
                    lst.append(name)
    for lst in norm_slots.values():
        lst.sort(key=lambda n: int(_NORM_RE.match(n).group(1)))
    # torch norm names per parent, by index order
    torch_norms: Dict[Tuple[str, ...], list] = {}
    for key in sd:
        parts = _rename(key)
        if len(parts) >= 2 and re.fullmatch(r"norm\d+", parts[-2]):
            parent = parts[:-2]
            lst = torch_norms.setdefault(parent, [])
            if parts[-2] not in lst:
                lst.append(parts[-2])
    for lst in torch_norms.values():
        lst.sort(key=lambda n: int(n[len("norm"):]))
    norm_map: Dict[Tuple[str, ...], str] = {}
    for parent, tnames in torch_norms.items():
        slots = norm_slots.get(parent, [])
        for pos, tname in enumerate(tnames):
            if pos < len(slots):
                norm_map[parent + (tname,)] = slots[pos]

    # --- translate each torch entry into the template
    new_params = dict(params_flat)
    new_bs = dict(bs_flat)
    problems = []
    for key, w in sd.items():
        parts = _rename(key)
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        modpath = parts[:-1]
        is_norm = bool(re.fullmatch(r"norm\d+", modpath[-1])) \
            if modpath else False
        if is_norm:
            mapped = norm_map.get(modpath)
            if mapped is None:
                problems.append(f"no flax norm slot for {key}")
                continue
            modpath = modpath[:-1] + (mapped,)
            if leaf == "weight":
                dest, leaf = new_params, "scale"
            elif leaf == "bias":
                dest, leaf = new_params, "bias"
            elif leaf == "running_mean":
                dest, leaf = new_bs, "mean"
            elif leaf == "running_var":
                dest, leaf = new_bs, "var"
            else:
                problems.append(f"unknown norm entry {key}")
                continue
        elif leaf == "weight":
            dest, leaf = new_params, "kernel"
            if w.ndim >= 3:
                w = (_to_flax_convtranspose(w)
                     if modpath[-1] == "upconv" else _to_flax_conv(w))
        elif leaf == "bias":
            dest = new_params
        else:
            problems.append(f"unknown entry {key}")
            continue
        path = modpath + (leaf,)
        if path not in dest:
            problems.append(f"{key} -> {'/'.join(path)} not in flax tree")
            continue
        tgt = dest[path]
        if tuple(tgt.shape) != tuple(w.shape):
            problems.append(
                f"{key}: shape {tuple(w.shape)} != flax "
                f"{'/'.join(path)} {tuple(tgt.shape)}")
            continue
        dest[path] = jnp.asarray(w, tgt.dtype)

    if problems:
        msg = "torch checkpoint import issues:\n  " + "\n  ".join(problems)
        if strict:
            raise ValueError(msg)
        logger.warning(msg)

    out = {"params": _unflatten(new_params)}
    if new_bs:
        out["batch_stats"] = _unflatten(new_bs)
    return out
