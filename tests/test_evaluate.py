"""Evaluator correctness: drive chess_vision_tpu.evaluate on a tiny dataset
with a rigged model whose predictions are known, and check every reported
metric by hand. Also covers the Kaggle filename-FEN mode (no manifest ->
legal=0 everywhere -> turn/castling metrics skipped).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from chess_vision_tpu.data import BatchLoader, ChessDataset
from chess_vision_tpu.datagen.generate import generate_split
from chess_vision_tpu.evaluate import evaluate
from chess_vision_tpu.fen import fen_to_labels, labels_to_fen
from chess_vision_tpu.parallel.mesh import make_mesh
import jax


class RiggedModel(nn.Module):
    """Predicts a fixed board for every input; turn logit>0; castling all >0."""

    board_fen: str = "8/8/8/8/8/8/8/8"

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        labels = fen_to_labels(self.board_fen)
        onehot = jnp.eye(13)[labels] * 10.0 - 5.0  # confident logits
        squares = jnp.broadcast_to(onehot.reshape(1, -1), (B, 832))
        # dummy param so init works
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return {
            "squares": squares + 0 * bias,
            "turn": jnp.full((B, 1), 3.0),      # always predicts black
            "castling": jnp.full((B, 4), 3.0),  # always predicts KQkq
        }


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("eval") / "imgs")
    generate_split(d, [("game", 10)], size=64, seed=3, workers=1)
    return d


def _run_eval(model, dataset, batch_size=4):
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    mesh = make_mesh(jax.devices()[:1])
    loader = BatchLoader(dataset, np.arange(len(dataset)), batch_size,
                         num_workers=1)
    return evaluate(model, variables["params"], {}, dataset, loader, mesh,
                    (0.5,) * 3, (0.5,) * 3, verbose=False)


def test_rigged_metrics_match_hand_computation(tiny_dir):
    dataset = ChessDataset(tiny_dir, input_size=64)
    # rig the model to predict sample 0's exact board
    fen0 = dataset.samples[0]["fen"].split()[0]
    model = RiggedModel(board_fen=fen0)
    metrics = _run_eval(model, dataset)

    n = len(dataset)
    labels = [fen_to_labels(s["fen"].split()[0]) for s in dataset.samples]
    pred = fen_to_labels(fen0)
    exp_square_acc = np.mean([np.mean(l == pred) for l in labels])
    exp_board_acc = np.mean([np.array_equal(l, pred) for l in labels])
    assert metrics["square_acc"] == pytest.approx(exp_square_acc)
    assert metrics["board_acc"] == pytest.approx(exp_board_acc)
    assert metrics["total_boards"] == n

    # turn metric: model always says black; manifest rows are all legal
    turns = [s["turn"] for s in dataset.samples]
    exp_turn = np.mean([t == "b" for t in turns])
    assert metrics["total_legal"] == n
    assert metrics["turn_acc"] == pytest.approx(exp_turn)

    # castling metric: model always says KQkq
    exp_castling = np.mean([s["castling"] == "KQkq" for s in dataset.samples])
    assert metrics["castling_acc"] == pytest.approx(exp_castling)


def test_kaggle_filename_mode(tmp_path):
    """No manifest -> FEN from filename, legal=0 for all, turn/castling
    metrics reported over zero legal samples (reference evaluate.py:106-123)."""
    from PIL import Image

    d = str(tmp_path / "kaggle")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    fens = []
    for i in range(6):
        labels = rng.integers(0, 13, 64).astype(np.int32)
        fen = labels_to_fen(labels)
        fens.append(fen)
        img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, fen.replace("/", "-") + ".jpeg"))

    dataset = ChessDataset(d, input_size=64)
    assert not dataset.use_manifest
    model = RiggedModel(board_fen=fens[0])
    metrics = _run_eval(model, dataset)
    assert metrics["total_legal"] == 0
    assert metrics["turn_acc"] == 0.0  # divided over max(legal,1)
    assert metrics["board_acc"] == pytest.approx(1.0 / 6.0)
