"""Serving-path tests: Predictor end-to-end on a tiny checkpoint, mode and
quant variants, YCbCr conversion math."""

import os

import numpy as np
import pytest

from chess_vision_tpu.serve import rgb_to_ycbcr420


def test_rgb_to_ycbcr420_roundtrip_grays(rng):
    # grayscale images have Cb=Cr=128 and Y == gray level
    g = rng.integers(0, 256, (8, 8))[..., None].repeat(3, -1).astype(np.uint8)
    y, cb, cr = rgb_to_ycbcr420(g)
    np.testing.assert_allclose(y, g[..., 0], atol=1)
    assert np.abs(cb.astype(int) - 128).max() <= 1
    assert np.abs(cr.astype(int) - 128).max() <= 1


def test_ycbcr_device_reconstruction_close(rng):
    import jax.numpy as jnp

    from chess_vision_tpu.ops.preprocess import ycbcr420_to_normalized

    # chroma-smooth image (4:2:0 is inherently lossy at sharp color edges,
    # so the test image interpolates smoothly)
    from PIL import Image

    small = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    img = np.asarray(Image.fromarray(small).resize((64, 64), Image.BILINEAR))
    y, cb, cr = rgb_to_ycbcr420(img)
    rec = np.asarray(ycbcr420_to_normalized(
        jnp.asarray(y)[None], jnp.asarray(cb)[None], jnp.asarray(cr)[None],
        (0.0, 0.0, 0.0), (1 / 255.0,) * 3, jnp.float32,
    ))[0]
    # reconstruction error stays within a few LSB on smooth content
    assert np.abs(rec - img.astype(np.float32)).mean() < 3.0


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A tiny trained-ish vit checkpoint + a couple of board images."""
    import jax

    from chess_vision_tpu.datagen.generate import generate_split
    from chess_vision_tpu.models import build_model
    from chess_vision_tpu.utils.checkpoint import save_checkpoint

    d = tmp_path_factory.mktemp("serve")
    img_dir = str(d / "imgs")
    generate_split(img_dir, [("random", 6)], size=64, seed=5, workers=1)

    cfg = {
        "model": {"arch": "vit", "input_size": 64, "head_dropout": 0.0,
                  "drop_path_rate": 0.0},
        "training": {"mixed_precision": False},
        "data": {"num_workers": 0},
    }
    import jax.numpy as jnp

    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    path = str(d / "ckpt.msgpack")
    save_checkpoint(path, variables["params"], {}, {}, step=0, epoch=0,
                    best_val_acc=0.0, config=cfg)
    return path, img_dir


@pytest.mark.parametrize("mode,quant", [
    ("rgb", None), ("ycbcr420", None), ("rgb", "int8"), ("ycbcr420", "int8"),
])
def test_predictor_end_to_end(tiny_ckpt, mode, quant):
    from chess_vision_tpu.fen import fen_to_labels
    from chess_vision_tpu.serve import Predictor

    ckpt, img_dir = tiny_ckpt
    paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
        if f.endswith(".jpg")
    )
    p = Predictor(ckpt, batch_size=4, decode_workers=2, mode=mode, quant=quant)
    fens = p.predict_files(paths)
    assert len(fens) == len(paths)
    for fen in fens:
        placement, turn, castling = fen.split()
        fen_to_labels(placement)  # valid
        assert turn in ("w", "b")


def test_predictor_int8_requires_vit(tiny_ckpt, tmp_path):
    import jax
    import jax.numpy as jnp

    from chess_vision_tpu.models import build_model
    from chess_vision_tpu.serve import Predictor
    from chess_vision_tpu.utils.checkpoint import save_checkpoint

    cfg = {
        "model": {"arch": "square", "input_size": 64, "square_input_size": 32,
                  "head_dropout": 0.0},
        "training": {"mixed_precision": False},
    }
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    path = str(tmp_path / "sq.ckpt")
    save_checkpoint(path, variables["params"], {},
                    variables.get("batch_stats", {}), step=0, epoch=0,
                    best_val_acc=0.0, config=cfg)
    with pytest.raises(ValueError):
        Predictor(path, quant="int8")


def test_predict_array_both_modes(tiny_ckpt, rng):
    from chess_vision_tpu.serve import Predictor

    ckpt, _ = tiny_ckpt
    imgs = rng.integers(0, 256, (5, 64, 64, 3)).astype(np.uint8)
    fens_rgb = Predictor(ckpt, batch_size=4, mode="rgb").predict_array(imgs)
    fens_planes = Predictor(ckpt, batch_size=4,
                            mode="ycbcr420").predict_array(imgs)
    assert len(fens_rgb) == len(fens_planes) == 5


def test_predictor_multichip_mesh_matches_single(tiny_ckpt, rng):
    """DP-sharded serving over the 8-device mesh must equal 1-device output."""
    import jax

    from chess_vision_tpu.parallel.mesh import make_mesh
    from chess_vision_tpu.serve import Predictor

    ckpt, _ = tiny_ckpt
    imgs = rng.integers(0, 256, (8, 64, 64, 3)).astype(np.uint8)
    single = Predictor(ckpt, batch_size=8).predict_array(imgs)
    mesh = make_mesh(jax.devices())
    sharded = Predictor(ckpt, batch_size=8, mesh=mesh).predict_array(imgs)
    assert single == sharded

    with pytest.raises(ValueError):
        Predictor(ckpt, batch_size=6, mesh=mesh)


def test_predictor_multichip_int8_matches_single(tiny_ckpt, rng):
    """Int8 serving runs under shard_map on a mesh (the Pallas kernels carry
    no GSPMD rules); per-shard math is identical, so 8-device DP output must
    equal the 1-device int8 output exactly."""
    import jax

    from chess_vision_tpu.parallel.mesh import make_mesh
    from chess_vision_tpu.serve import Predictor

    ckpt, _ = tiny_ckpt
    imgs = rng.integers(0, 256, (8, 64, 64, 3)).astype(np.uint8)
    single = Predictor(ckpt, batch_size=8, quant="int8").predict_array(imgs)
    mesh = make_mesh(jax.devices())
    sharded = Predictor(ckpt, batch_size=8, quant="int8",
                        mesh=mesh).predict_array(imgs)
    assert single == sharded
