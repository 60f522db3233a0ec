"""Unit tests for the FEN <-> label codec (parity with reference dataset.py/predict.py)."""

import numpy as np
import pytest

from chess_vision_tpu.fen import (
    CLASS_TO_COLOR,
    CLASS_TO_TYPE,
    NUM_CLASSES,
    PIECE_TO_INDEX,
    assemble_fen,
    assemble_fens_batch,
    fen_to_labels,
    filename_to_fen,
    flip_fen,
    labels_to_fen,
    parse_full_fen,
)

START = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"


def test_fen_to_labels_start_position():
    labels = fen_to_labels(START)
    assert labels.shape == (64,)
    assert labels.dtype == np.int32
    # index 0 = a8 = black rook, 4 = e8 = black king
    assert labels[0] == PIECE_TO_INDEX["r"]
    assert labels[4] == PIECE_TO_INDEX["k"]
    # index 60 = e1 = white king, 63 = h1 = white rook
    assert labels[60] == PIECE_TO_INDEX["K"]
    assert labels[63] == PIECE_TO_INDEX["R"]
    # ranks 3-6 empty
    assert (labels[16:48] == 0).all()


@pytest.mark.parametrize(
    "fen",
    [
        START,
        "8/8/8/8/8/8/8/8",
        "k7/8/8/8/8/8/8/7K",
        "r1bq1rk1/pp2bppp/2n2n2/2pp4/8/1P1P1NP1/PBPN1PBP/R2Q1RK1",
        "1B1B1K2/3p1N2/8/8/8/8/8/1B6",
        "8/2Q5/8/8/8/8/qqq5/K6k",
    ],
)
def test_roundtrip(fen):
    assert labels_to_fen(fen_to_labels(fen)) == fen


def test_roundtrip_random(rng):
    for _ in range(200):
        labels = rng.integers(0, NUM_CLASSES, size=64).astype(np.int32)
        fen = labels_to_fen(labels)
        np.testing.assert_array_equal(fen_to_labels(fen), labels)


def test_fen_to_labels_bad_length():
    with pytest.raises(ValueError):
        fen_to_labels("8/8/8")


def test_filename_to_fen():
    assert filename_to_fen("1B1B1K2-3p1N2-8-8-8-8-8-1B6.jpeg") == \
        "1B1B1K2/3p1N2/8/8/8/8/8/1B6"
    assert filename_to_fen("/some/dir/8-8-8-8-8-8-8-8.png") == "8/8/8/8/8/8/8/8"


def test_parse_full_fen():
    out = parse_full_fen(
        "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq -"
    )
    assert out["squares"].shape == (64,)
    assert out["turn"].tolist() == [1.0]
    assert out["castling"].tolist() == [1.0, 1.0, 1.0, 1.0]

    out = parse_full_fen(START)  # placement only -> defaults
    assert out["turn"].tolist() == [0.0]
    assert out["castling"].tolist() == [0.0, 0.0, 0.0, 0.0]

    out = parse_full_fen(START + " w Kq e3 0 1")
    assert out["castling"].tolist() == [1.0, 0.0, 0.0, 1.0]


def test_assemble_fen():
    labels = fen_to_labels(START)
    fen = assemble_fen(labels, turn_logit=-0.3, castling_logits=[1.0, -1, 2.0, -5])
    assert fen == f"{START} w Kk"
    fen = assemble_fen(labels, turn_logit=0.5, castling_logits=[-1, -1, -1, -1])
    assert fen == f"{START} b -"


def test_assemble_fens_batch():
    labels = np.stack([fen_to_labels(START), fen_to_labels("8/8/8/8/8/8/8/8")])
    fens = assemble_fens_batch(
        labels, np.array([[0.1], [-0.1]]), np.array([[1, 1, 1, 1], [-1, -1, -1, -1.0]])
    )
    assert fens == [f"{START} b KQkq", "8/8/8/8/8/8/8/8 w -"]


def test_flip_fen():
    # Flipping the start position swaps colors' sides of the board but not
    # piece colors: a8 rook (black) ends up at h1.
    flipped = flip_fen(START)
    assert flipped == "RNBKQBNR/PPPPPPPP/8/8/8/8/pppppppp/rnbkqbnr"
    # Double flip is identity
    assert flip_fen(flipped) == START
    assert flip_fen("8/8/8/8/8/8/8/Q7") == "7Q/8/8/8/8/8/8/8"


def test_type_color_decomposition_consistency():
    # joint class c must decompose so that (type, color) uniquely identifies c
    pairs = list(zip(CLASS_TO_TYPE.tolist(), CLASS_TO_COLOR.tolist()))
    assert len(set(pairs)) == NUM_CLASSES
    assert pairs[0] == (0, 0)
    # white pieces have color 1, black color 2
    assert all(c == 1 for c in CLASS_TO_COLOR[1:7])
    assert all(c == 2 for c in CLASS_TO_COLOR[7:13])
