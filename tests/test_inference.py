"""Tiled-inference engine tests."""

import numpy as np
import pytest

from elektronn3_tpu.inference import Predictor, tiled_apply
from elektronn3_tpu.models.unet import UNet, init_unet


def identity_func(x):
    return x


def test_tiled_apply_identity(rng):
    inp = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    out = tiled_apply(identity_func, inp, tile_shape=(8, 8),
                      overlap_shape=(2, 2), offset=None,
                      out_shape=(1, 1, 16, 16))
    assert np.allclose(out, inp, atol=1e-6)


def test_tiled_apply_3d_identity(rng):
    inp = rng.normal(size=(1, 2, 8, 16, 16)).astype(np.float32)
    out = tiled_apply(identity_func, inp, tile_shape=(4, 8, 8),
                      overlap_shape=(2, 4, 4), offset=None,
                      out_shape=(1, 2, 8, 16, 16))
    assert np.allclose(out, inp, atol=1e-6)


def test_tiled_apply_offset(rng):
    """Simulate a valid-conv model that shrinks by 2 per side."""

    def shrink(x):
        return x[:, :, 2:-2, 2:-2]

    inp = rng.normal(size=(1, 1, 20, 20)).astype(np.float32)
    out = tiled_apply(shrink, inp, tile_shape=(8, 8),
                      overlap_shape=(2, 2), offset=(2, 2),
                      out_shape=(1, 1, 16, 16))
    assert out.shape == (1, 1, 16, 16)
    assert np.allclose(out, inp[:, :, 2:-2, 2:-2], atol=1e-6)


def test_tiled_apply_bad_tile_shape(rng):
    inp = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    with pytest.raises(ValueError):
        tiled_apply(identity_func, inp, tile_shape=(7, 7),
                    overlap_shape=(2, 2), offset=None,
                    out_shape=(1, 1, 16, 16))


@pytest.fixture(scope="module")
def unet2d_state():
    model = UNet(in_channels=1, out_channels=2, n_blocks=2, start_filts=4,
                 dim=2, normalization="none")
    variables = init_unet(model, (1, 16, 16, 1))
    return model, variables


def test_predictor_whole_image(unet2d_state, rng):
    model, variables = unet2d_state
    pr = Predictor(model=model, state=variables, apply_softmax=True)
    inp = rng.normal(size=(1, 1, 32, 32)).astype(np.float32)
    out = pr.predict(inp)
    assert out.shape == (1, 2, 32, 32)
    assert np.allclose(out.sum(1), 1.0, atol=1e-4)  # softmax probs


def test_predictor_tiled_equals_whole(unet2d_state, rng):
    """Tiled prediction with sufficient overlap must equal whole-image
    prediction away from borders (same-conv model, overlap >= RF/2)."""
    model, variables = unet2d_state
    inp = rng.normal(size=(1, 1, 32, 32)).astype(np.float32)
    whole = Predictor(model=model, state=variables).predict(inp)
    tiled = Predictor(model=model, state=variables, tile_shape=(16, 16),
                      overlap_shape=(8, 8)).predict(inp)
    assert tiled.shape == whole.shape
    # Compare interior (border effects from zero-padding differ)
    assert np.allclose(whole[..., 8:-8, 8:-8], tiled[..., 8:-8, 8:-8],
                       atol=1e-3)


def test_predictor_auto_pad(unet2d_state, rng):
    model, variables = unet2d_state
    pr = Predictor(model=model, state=variables, tile_shape=(16, 16),
                   overlap_shape=(4, 4))
    inp = rng.normal(size=(1, 1, 30, 26)).astype(np.float32)
    out = pr.predict(inp)
    assert out.shape == (1, 2, 30, 26)


def test_predictor_strict_shapes_raises(unet2d_state, rng):
    model, variables = unet2d_state
    pr = Predictor(model=model, state=variables, tile_shape=(16, 16),
                   overlap_shape=(4, 4), strict_shapes=True)
    inp = rng.normal(size=(1, 1, 30, 26)).astype(np.float32)
    with pytest.raises(ValueError):
        pr.predict(inp)


def test_predictor_tta(unet2d_state, rng):
    model, variables = unet2d_state
    pr = Predictor(model=model, state=variables,
                   augmentations=[(), (2,), (3,), (2, 3)])
    inp = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    out = pr.predict(inp)
    assert out.shape == (1, 2, 16, 16)
    assert np.allclose(out.sum(1), 1.0, atol=1e-4)


def test_predictor_argmax(unet2d_state, rng):
    model, variables = unet2d_state
    pr = Predictor(model=model, state=variables,
                   argmax_with_threshold=True)
    inp = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    out = pr.predict(inp)
    assert out.shape == (1, 1, 16, 16)
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_predictor_out_dtype_defaults(unet2d_state, rng):
    """Reference out_dtype defaults (inference.py:455-456,613-615):
    uint8 class ids under an argmax head, compute dtype otherwise.
    The cast happens ON DEVICE before the D2H copy."""
    model, variables = unet2d_state
    inp = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    pr = Predictor(model=model, state=variables,
                   argmax_with_threshold=True)
    out = pr.predict(inp)
    assert out.dtype == np.uint8
    assert set(np.unique(out)).issubset({0, 1})
    probs = Predictor(model=model, state=variables).predict(inp)
    assert probs.dtype == np.float32


def test_predictor_out_dtype_bf16_tiled(unet2d_state, rng):
    """Explicit bf16 probability output through the tiled path: the
    host buffer is allocated in out_dtype and values match the f32
    path to bf16 resolution."""
    import ml_dtypes
    model, variables = unet2d_state
    inp = rng.normal(size=(1, 1, 32, 32)).astype(np.float32)
    pr = Predictor(model=model, state=variables, out_dtype="bfloat16",
                   tile_shape=(16, 16), overlap_shape=(8, 8))
    out = pr.predict(inp)
    assert out.dtype == ml_dtypes.bfloat16
    ref = Predictor(model=model, state=variables, tile_shape=(16, 16),
                    overlap_shape=(8, 8)).predict(inp)
    assert np.allclose(out.astype(np.float32), ref, atol=2e-2)


def test_predictor_tiled_argmax_uint8(unet2d_state, rng):
    """Tiled argmax prediction: ONE channel of uint8 ids in the host
    buffer (argmax collapses the class axis; the buffer must not be
    allocated with the model's class count)."""
    model, variables = unet2d_state
    inp = rng.normal(size=(1, 1, 32, 32)).astype(np.float32)
    pr = Predictor(model=model, state=variables,
                   argmax_with_threshold=True,
                   tile_shape=(16, 16), overlap_shape=(8, 8))
    out = pr.predict(inp)
    assert out.shape == (1, 1, 32, 32)
    assert out.dtype == np.uint8
    whole = Predictor(model=model, state=variables,
                      argmax_with_threshold=True).predict(inp)
    # Interior ids must agree with the whole-image argmax.
    assert np.array_equal(out[..., 8:-8, 8:-8], whole[..., 8:-8, 8:-8])


def test_predictor_uint8_class_guard():
    """>255-class argmax output can't ship as uint8 ids (reference
    inference.py:613-615)."""
    import jax.numpy as jnp

    def fake_model(x):
        return jnp.repeat(x, 300, axis=-1)

    pr = Predictor(model=fake_model, out_channels=300,
                   argmax_with_threshold=True, apply_softmax=False)
    with pytest.raises(ValueError, match="255"):
        pr.predict(np.zeros((1, 1, 8, 8), np.float32))


def test_predictor_batch_split(unet2d_state, rng):
    model, variables = unet2d_state
    pr_split = Predictor(model=model, state=variables, batch_size=2)
    pr_whole = Predictor(model=model, state=variables)
    inp = rng.normal(size=(5, 1, 16, 16)).astype(np.float32)
    assert np.allclose(pr_split.predict(inp), pr_whole.predict(inp),
                       atol=1e-5)


def test_predictor_from_saved_model(unet2d_state, tmp_path, rng):
    from elektronn3_tpu.training.trainer import save_model
    model, variables = unet2d_state
    path = str(tmp_path / "model.e3tpu")
    save_model(model, variables, path)
    pr = Predictor(model=path)
    inp = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    out = pr.predict(inp)
    assert out.shape == (1, 2, 16, 16)


def test_predictor_valid_conv_offset(rng):
    """End-to-end valid-conv model with auto offset probing."""
    model = UNet(in_channels=1, out_channels=2, n_blocks=1, start_filts=2,
                 dim=2, normalization="none", conv_mode="valid")
    variables = init_unet(model, (1, 20, 20, 1))
    pr = Predictor(model=model, state=variables, offset="auto")
    inp = rng.normal(size=(1, 1, 20, 20)).astype(np.float32)
    out = pr.predict(inp)
    # 1-block valid UNet shrinks by 2 convs * 2 px = 4 total, 2 per side.
    # Probed offsets live in a rank-keyed cache (self.offset stays as
    # configured so one Predictor serves volumes of any rank).
    assert pr._offset_by_rank[4] == (2, 2)
    assert pr.offset is None
    assert out.shape == (1, 2, 16, 16)
    # Second predict on the same rank reuses the cached offset.
    out2 = pr.predict(inp)
    assert out2.shape == (1, 2, 16, 16)
