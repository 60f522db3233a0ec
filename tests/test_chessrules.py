"""Tests for the built-in chess rules engine (datagen dependency)."""

import numpy as np
import pytest

from chess_vision_tpu.datagen.chessrules import (
    Game,
    name_sq,
    strip_pgn_movetext,
)


def test_start_position():
    g = Game()
    assert g.placement_fen() == "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"
    assert g.full_fen().endswith(" w KQkq -")
    assert len(g.legal_moves()) == 20


def test_scholars_mate():
    g = Game()
    for san in ["e4", "e5", "Qh5", "Nc6", "Bc4", "Nf6", "Qxf7"]:
        g.push_san(san)
    assert g.in_check("b")
    assert g.legal_moves() == []


def test_castling_kingside_and_rights():
    g = Game()
    for san in ["e4", "e5", "Nf3", "Nc6", "Bc4", "Bc5", "O-O"]:
        g.push_san(san)
    assert g.placement_fen().split("/")[-1] == "RNBQ1RK1"
    assert g.castling_fen() == "kq"


def test_castling_queenside():
    g = Game()
    for san in ["d4", "d5", "Nc3", "Nc6", "Bf4", "Bf5", "Qd2", "Qd7",
                "O-O-O", "O-O-O"]:
        g.push_san(san)
    assert g.castling_fen() == "-"
    assert g.placement_fen().split("/")[-1] == "2KR1BNR"


def test_en_passant():
    g = Game()
    for san in ["e4", "a6", "e5", "d5"]:
        g.push_san(san)
    assert g.en_passant_fen() == "d6"
    g.push_san("exd6")
    assert "d5" not in [  # black d-pawn is gone
        s for s in []
    ]
    assert g.placement_fen() == "rnbqkbnr/1pp1pppp/p2P4/8/8/8/PPPP1PPP/RNBQKBNR"


def test_promotion():
    g = Game()
    # Fast forced promotion line
    for san in ["a4", "b5", "axb5", "a6", "bxa6", "Nc6", "a7", "Rb8", "axb8=Q"]:
        g.push_san(san)
    assert "Q" in g.placement_fen().split("/")[0]


def test_rook_move_clears_right():
    g = Game()
    for san in ["h4", "h5", "Rh3", "Rh6"]:
        g.push_san(san)
    assert g.castling_fen() == "Qq"


def test_pinned_piece_cannot_move():
    g = Game()
    for san in ["e4", "e5", "Nf3", "Nc6", "Bb5", "Nf6"]:
        g.push_san(san)
    # White plays something; knight on c6 is pinned against the king? Actually
    # after Bb5 black knight c6 is pinned once d7 pawn... construct directly:
    g2 = Game()
    for san in ["e4", "d6", "Bb5+"]:
        g2.push_san(san)
    # Black is in check; only blocking/king moves are legal
    for m in g2.legal_moves():
        undo = g2._apply(m)
        assert not g2.in_check("b")
        g2._undo(undo)


def test_random_playouts_stay_legal(rng):
    """Self-play never reaches a state where the side to move can capture the
    king, and FENs stay parseable."""
    from chess_vision_tpu.fen import fen_to_labels

    for seed in range(3):
        g = Game()
        r = np.random.default_rng(seed)
        for _ in range(80):
            moves = g.legal_moves()
            if not moves:
                break
            g.push(moves[int(r.integers(0, len(moves)))])
            labels = fen_to_labels(g.placement_fen())
            assert (labels == 6).sum() == 1 and (labels == 12).sum() == 1
            # side NOT to move must never be in check after their own move
            prev = "w" if g.turn == "b" else "b"
            assert not g.in_check(prev)


def test_strip_pgn_movetext():
    tokens = strip_pgn_movetext(
        "1. e4 {comment} e5 (1... c5 2. Nf3 (2. d4)) 2. Nf3! Nc6 $1 3. O-O 1-0"
    )
    assert tokens == ["e4", "e5", "Nf3", "Nc6", "O-O"]


def test_pgn_replay_full_game():
    g = Game()
    movetext = ("1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 4. Ba4 Nf6 5. O-O Be7 "
                "6. Re1 b5 7. Bb3 d6 8. c3 O-O")
    for san in strip_pgn_movetext(movetext):
        g.push_san(san)
    # Both sides castled; castling rights exhausted
    assert g.castling_fen() == "-"
    assert g.turn == "w"


def test_illegal_san_raises():
    g = Game()
    with pytest.raises(ValueError):
        g.push_san("Ke2")  # king can't move at start
    with pytest.raises(ValueError):
        g.push_san("xyz")


def test_name_sq():
    assert name_sq("a8") == 0
    assert name_sq("h1") == 63
    assert name_sq("e4") == 36
