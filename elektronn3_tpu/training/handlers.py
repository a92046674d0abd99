"""Default tensorboard plotting handlers for train/val samples and
preview predictions.

Reference: elektronn3/training/handlers.py:41-479 (plot_image,
_get_batch2img_function, _tb_log_preview, _tb_log_sample_images).
Channels-last adaptation; matplotlib figures are rendered with the Agg
backend and logged via the Trainer's SummaryWriter.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import numpy as np

from elektronn3_tpu import logger

E3_CMAP: Optional[str] = os.environ.get("E3_CMAP")


def _get_cmap(num_classes: int):
    import matplotlib
    if E3_CMAP is not None:
        return matplotlib.colormaps[E3_CMAP]
    return matplotlib.colormaps["viridis"]


def plot_image(image: np.ndarray, overlay: Optional[np.ndarray] = None,
               overlay_alpha: float = 0.2, cmap="gray",
               num_classes: Optional[int] = None,
               colorbar: bool = True, filename: str = ""):
    """Create a matplotlib figure of a (H, W) image, optionally with a
    segmentation overlay. Reference handlers.py:41-84."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(image, cmap=cmap, interpolation="nearest")
    if overlay is not None:
        ocmap = _get_cmap(num_classes or int(overlay.max()) + 1)
        ax.imshow(overlay, cmap=ocmap, alpha=overlay_alpha,
                  interpolation="nearest")
    if colorbar:
        fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
    if filename:
        ax.set_title(filename)
    fig.tight_layout()
    return fig


def _get_batch2img_function(batch: np.ndarray,
                            z_plane: Optional[int] = None) -> Callable:
    """Map a (N, C, [D,] H, W) batch to a 2D (H, W) or (C, H, W) image
    by slicing n=0 and (for 3D) the middle z plane.
    Reference handlers.py:87-121."""
    if batch.ndim == 5:  # (N, C, D, H, W)
        if z_plane is None:
            z_plane = batch.shape[2] // 2
        return lambda b: b[0, :, z_plane]
    if batch.ndim == 4:  # (N, C, H, W)
        return lambda b: b[0]
    if batch.ndim == 3:  # (N, H, W)
        return lambda b: b[0][None]
    raise ValueError(f"Can't handle batch of shape {batch.shape}")


def _fig_to_tb(tb, tag: str, fig, step: int):
    tb.add_figure(tag, fig, global_step=step)


def _tb_log_preview(trainer, z_plane: Optional[int] = None,
                    group: str = "preview") -> None:
    """Preview inference + TB logging. Reference handlers.py:162-240."""
    if trainer.preview_batch is None or trainer.tb is None:
        return
    from elektronn3_tpu.inference import Predictor
    inp = np.asarray(trainer.preview_batch)
    predictor = Predictor(
        model=trainer.model,
        state={"params": trainer.state.params,
               "batch_stats": trainer.state.batch_stats},
        **{k: v for k, v in trainer.inference_kwargs.items()})
    out = predictor.predict(inp)
    pred = np.argmax(out, 1)

    batch2img_inp = _get_batch2img_function(inp, z_plane)
    inp_img = batch2img_inp(inp)[0]
    b2i_out = _get_batch2img_function(out, z_plane)
    out_img = b2i_out(out)
    pred_img = np.argmax(out_img, 0)

    fig = plot_image(inp_img, cmap="gray", filename="preview inp")
    _fig_to_tb(trainer.tb, f"{group}/inp", fig, trainer.step)
    for c in range(out_img.shape[0]):
        fig = plot_image(out_img[c], cmap="viridis",
                         filename=f"preview c{c}")
        _fig_to_tb(trainer.tb, f"{group}/c{c}", fig, trainer.step)
    fig = plot_image(pred_img, cmap="viridis", filename="preview pred")
    _fig_to_tb(trainer.tb, f"{group}/pred", fig, trainer.step)
    fig = plot_image(inp_img, overlay=pred_img,
                     overlay_alpha=trainer.overlay_alpha, cmap="gray",
                     filename="preview overlay")
    _fig_to_tb(trainer.tb, f"{group}/overlay", fig, trainer.step)


def _tb_log_sample_images(trainer, images: dict,
                          z_plane: Optional[int] = None,
                          group: str = "sample") -> None:
    """Log input/target/prediction images of a training/validation
    sample. ``images`` has numpy 'inp', 'target', 'out' (N, C, [D,] H, W).
    Reference handlers.py:243-447."""
    if trainer.tb is None:
        return
    inp = images["inp"]
    batch2img = _get_batch2img_function(inp, z_plane)
    inp_img = batch2img(inp)[0]
    fig = plot_image(inp_img, cmap="gray", filename="inp")
    _fig_to_tb(trainer.tb, f"{group}/inp", fig, trainer.step)
    if "target" in images and images["target"] is not None:
        target = images["target"]
        t2i = _get_batch2img_function(
            target if target.ndim >= 3 else target[None])
        timg = t2i(target)
        timg = timg[0] if timg.ndim == 3 else timg
        fig = plot_image(timg, cmap="viridis", filename="target")
        _fig_to_tb(trainer.tb, f"{group}/target", fig, trainer.step)
    if "out" in images:
        out = images["out"]
        o2i = _get_batch2img_function(out, z_plane)
        out_img = o2i(out)
        pred = np.argmax(out_img, 0)
        fig = plot_image(pred, cmap="viridis", filename="pred")
        _fig_to_tb(trainer.tb, f"{group}/pred", fig, trainer.step)
        fig = plot_image(inp_img, overlay=pred,
                         overlay_alpha=trainer.overlay_alpha, cmap="gray",
                         filename="overlay")
        _fig_to_tb(trainer.tb, f"{group}/overlay", fig, trainer.step)
    if inp.ndim == 5 and getattr(trainer, "enable_videos", False):
        _tb_log_sample_videos(trainer, images, group=group)


def _tb_log_sample_images_all_img(trainer, images: dict,
                                  z_plane: Optional[int] = None,
                                  group: str = "sample") -> None:
    """Plot EVERY array in ``images`` as 2D grayscale figures,
    splitting multi-channel arrays per channel. Reference
    handlers.py:450-480 (_tb_log_sample_images_all_img)."""
    if trainer.tb is None:
        return
    images = dict(images)
    fname = images.pop("fname", None)
    name = fname[0] if fname else ""
    for key, img in images.items():
        if img is None:
            continue
        img = np.asarray(img)[:1]
        if img.ndim == 3:  # (N, H, W) dense targets
            img = img[:, None]
        batch2img = _get_batch2img_function(img, z_plane)
        img2d = batch2img(img)
        if img2d.shape[0] == 1:
            fig = plot_image(img2d[0], cmap="gray", filename=name or key)
            _fig_to_tb(trainer.tb, f"{group}/{key}", fig, trainer.step)
        else:
            for c in range(img2d.shape[0]):
                fig = plot_image(img2d[c], cmap="gray",
                                 filename=name or f"{key}{c}")
                _fig_to_tb(trainer.tb, f"{group}/{key}{c}", fig,
                           trainer.step)


def _tb_log_sample_videos(trainer, images: dict,
                          group: str = "sample") -> None:
    """3D samples as 2D videos over the D axis (reference
    handlers.py:181-195: add_video of the input and of each output
    channel). Requires a writer with add_video (torch TB has one;
    moviepy is needed for actual encoding — failures are logged, not
    raised)."""
    from elektronn3_tpu.data.utils import squash01
    if trainer.tb is None or not hasattr(trainer.tb, "add_video"):
        return
    try:
        import torch
        inp = images["inp"]  # (N, C, D, H, W)
        vid = np.swapaxes(squash01(np.asarray(inp, np.float32)), 1, 2)
        trainer.tb.add_video(f"{group}_vid/inp",
                             torch.from_numpy(np.ascontiguousarray(vid)),
                             global_step=trainer.step)
        out = images.get("out")
        if out is not None:
            for c in range(out.shape[1]):
                v = squash01(np.asarray(out[:, c][None], np.float32))
                v = np.moveaxis(v, 1, 2)
                trainer.tb.add_video(
                    f"{group}_vid/out{c}",
                    torch.from_numpy(np.ascontiguousarray(v)),
                    global_step=trainer.step)
    except Exception:
        logger.exception("video logging failed (is moviepy installed?)")


def write_to_kzip(trainer, pred_batch: np.ndarray) -> None:
    """Export a preview prediction to a KNOSSOS .k.zip annotation file
    with the movement area set around it. Reference handlers.py:124-158.
    Requires knossos_utils and trainer.knossos_preview_config with
    'dataset', 'offset' and 'size' keys."""
    try:
        from knossos_utils import KnossosDataset
    except ImportError:
        logger.warning("knossos_utils not available; skipping kzip export")
        return
    ks = getattr(trainer, "knossos_preview_config", None)
    if not ks:
        raise ValueError(
            "kzip export requires trainer.knossos_preview_config with "
            "'dataset', 'offset' and 'size' keys")
    dataset_path = ks["dataset"] if isinstance(ks["dataset"], str) \
        else ks["dataset"][0]
    ds = KnossosDataset(dataset_path)
    # (N, D, H, W) -> (W, H, D) for the KNOSSOS axis convention
    seg = np.asarray(pred_batch)[0].swapaxes(0, 2)
    area_min, area_sz = ks["offset"], ks["size"]
    anno_str = f"""<?xml version="1.0" encoding="UTF-8"?>
<things>
    <parameters>
        <MovementArea min.x="{area_min[0]}" min.y="{area_min[1]}" \
min.z="{area_min[2]}" size.x="{area_sz[0]}" size.y="{area_sz[1]}" \
size.z="{area_sz[2]}"/>
    </parameters>
    <comments/>
    <branchpoints/>
</things>"""
    kzip_path = f"{trainer.save_path}/preview_{trainer.step}.k.zip"
    logger.info(f"Writing preview inference to {kzip_path}")
    ds.save_to_kzip(
        data=seg,
        data_mag=ks.get("mag", 1),
        kzip_path=kzip_path,
        offset=ks["offset"],
        mags=ks.get("target_mags", [1, 2]),
        gen_mergelist=False,
        upsample=False,
        fast_resampling=False,
        annotation_str=anno_str,
    )
