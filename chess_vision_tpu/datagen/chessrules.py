"""Minimal chess rules engine: legal move generation, castling, en passant,
promotion, SAN parsing and PGN replay.

Self-contained replacement for the chess.js dependency the reference's datagen
uses to replay PGN games (reference datagen/positions.js:127-160). Square
indexing matches the framework's label space: 0 = a8 ... 63 = h1.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

START_BOARD = list("rnbqkbnr" + "pppppppp" + "." * 32 + "PPPPPPPP" + "RNBQKBNR")

_KNIGHT = ((-2, -1), (-2, 1), (-1, -2), (-1, 2), (1, -2), (1, 2), (2, -1), (2, 1))
_KING = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
_BISHOP = ((-1, -1), (-1, 1), (1, -1), (1, 1))
_ROOK = ((-1, 0), (1, 0), (0, -1), (0, 1))

FILES = "abcdefgh"


def sq(row: int, col: int) -> int:
    return row * 8 + col


def sq_name(s: int) -> str:
    return FILES[s % 8] + str(8 - s // 8)


def name_sq(name: str) -> int:
    return sq(8 - int(name[1]), FILES.index(name[0]))


@dataclass(frozen=True)
class Move:
    src: int
    dst: int
    promo: str = ""  # 'q','r','b','n' (case-free; applied in mover's color)


class Game:
    def __init__(self):
        self.board = list(START_BOARD)
        self.turn = "w"
        # castling rights: K, Q, k, q
        self.rights = {"K": True, "Q": True, "k": True, "q": True}
        self.ep: int | None = None  # en-passant target square
        self.last_move: tuple[int, int] | None = None  # (src, dst) of last ply

    # -- FEN output ------------------------------------------------------
    def placement_fen(self) -> str:
        ranks = []
        for r in range(8):
            out, empty = "", 0
            for c in range(8):
                p = self.board[sq(r, c)]
                if p == ".":
                    empty += 1
                else:
                    if empty:
                        out += str(empty)
                        empty = 0
                    out += p
            if empty:
                out += str(empty)
            ranks.append(out)
        return "/".join(ranks)

    def castling_fen(self) -> str:
        s = "".join(k for k in "KQkq" if self.rights[k])
        return s or "-"

    def en_passant_fen(self) -> str:
        return sq_name(self.ep) if self.ep is not None else "-"

    def full_fen(self) -> str:
        return (f"{self.placement_fen()} {self.turn} {self.castling_fen()} "
                f"{self.en_passant_fen()}")

    # -- basic queries ---------------------------------------------------
    def _mine(self, p: str) -> bool:
        return p != "." and (p.isupper() == (self.turn == "w"))

    def _enemy(self, p: str) -> bool:
        return p != "." and (p.isupper() != (self.turn == "w"))

    def king_square(self, color: str) -> int:
        k = "K" if color == "w" else "k"
        return self.board.index(k)

    def attacked_by(self, square: int, color: str) -> bool:
        """Is `square` attacked by side `color`?"""
        r0, c0 = divmod(square, 8)
        enemy_upper = color == "w"

        def at(r, c):
            return self.board[sq(r, c)] if 0 <= r < 8 and 0 <= c < 8 else None

        # pawns (white pawns attack upward: from row+1 toward row)
        dr = 1 if color == "w" else -1
        for dc in (-1, 1):
            p = at(r0 + dr, c0 + dc)
            if p == ("P" if enemy_upper else "p"):
                return True
        for dr_, dc_ in _KNIGHT:
            p = at(r0 + dr_, c0 + dc_)
            if p == ("N" if enemy_upper else "n"):
                return True
        for dr_, dc_ in _KING:
            p = at(r0 + dr_, c0 + dc_)
            if p == ("K" if enemy_upper else "k"):
                return True
        for dirs, chars in ((_BISHOP, "BQ"), (_ROOK, "RQ")):
            targets = chars if enemy_upper else chars.lower()
            for dr_, dc_ in dirs:
                r, c = r0 + dr_, c0 + dc_
                while 0 <= r < 8 and 0 <= c < 8:
                    p = self.board[sq(r, c)]
                    if p != ".":
                        if p in targets:
                            return True
                        break
                    r += dr_
                    c += dc_
        return False

    def in_check(self, color: str | None = None) -> bool:
        color = color or self.turn
        return self.attacked_by(self.king_square(color), "b" if color == "w" else "w")

    # -- move generation -------------------------------------------------
    def _pseudo_moves(self):
        moves: list[Move] = []
        white = self.turn == "w"
        pawn_dir = -1 if white else 1
        start_row = 6 if white else 1
        promo_row = 0 if white else 7

        for s in range(64):
            p = self.board[s]
            if not self._mine(p):
                continue
            r0, c0 = divmod(s, 8)
            kind = p.upper()

            if kind == "P":
                # pushes
                r1 = r0 + pawn_dir
                if 0 <= r1 < 8 and self.board[sq(r1, c0)] == ".":
                    if r1 == promo_row:
                        for pr in "qrbn":
                            moves.append(Move(s, sq(r1, c0), pr))
                    else:
                        moves.append(Move(s, sq(r1, c0)))
                    r2 = r0 + 2 * pawn_dir
                    if r0 == start_row and self.board[sq(r2, c0)] == ".":
                        moves.append(Move(s, sq(r2, c0)))
                # captures
                for dc in (-1, 1):
                    c1 = c0 + dc
                    if not (0 <= c1 < 8) or not (0 <= r1 < 8):
                        continue
                    d = sq(r1, c1)
                    if self._enemy(self.board[d]) or d == self.ep:
                        if r1 == promo_row:
                            for pr in "qrbn":
                                moves.append(Move(s, d, pr))
                        else:
                            moves.append(Move(s, d))
            elif kind == "N" or kind == "K":
                for dr, dc in (_KNIGHT if kind == "N" else _KING):
                    r, c = r0 + dr, c0 + dc
                    if 0 <= r < 8 and 0 <= c < 8 and not self._mine(
                        self.board[sq(r, c)]
                    ):
                        moves.append(Move(s, sq(r, c)))
            else:
                dirs = _BISHOP if kind == "B" else _ROOK if kind == "R" else (
                    _BISHOP + _ROOK
                )
                for dr, dc in dirs:
                    r, c = r0 + dr, c0 + dc
                    while 0 <= r < 8 and 0 <= c < 8:
                        d = sq(r, c)
                        if self._mine(self.board[d]):
                            break
                        moves.append(Move(s, d))
                        if self.board[d] != ".":
                            break
                        r += dr
                        c += dc

        # castling
        row = 7 if white else 0
        enemy = "b" if white else "w"
        k_sq = sq(row, 4)
        if self.board[k_sq] == ("K" if white else "k") and not self.attacked_by(
            k_sq, enemy
        ):
            if (
                self.rights["K" if white else "k"]
                and self.board[sq(row, 5)] == "."
                and self.board[sq(row, 6)] == "."
                and self.board[sq(row, 7)] == ("R" if white else "r")
                and not self.attacked_by(sq(row, 5), enemy)
                and not self.attacked_by(sq(row, 6), enemy)
            ):
                moves.append(Move(k_sq, sq(row, 6)))
            if (
                self.rights["Q" if white else "q"]
                and self.board[sq(row, 3)] == "."
                and self.board[sq(row, 2)] == "."
                and self.board[sq(row, 1)] == "."
                and self.board[sq(row, 0)] == ("R" if white else "r")
                and not self.attacked_by(sq(row, 3), enemy)
                and not self.attacked_by(sq(row, 2), enemy)
            ):
                moves.append(Move(k_sq, sq(row, 2)))
        return moves

    def legal_moves(self) -> list[Move]:
        out = []
        for m in self._pseudo_moves():
            undo = self._apply(m)
            if not self.in_check("w" if self.turn == "b" else "b"):
                out.append(m)
            self._undo(undo)
        return out

    # -- apply / undo ----------------------------------------------------
    def _apply(self, m: Move):
        """Apply move, return undo record. Flips turn."""
        undo = (
            m,
            self.board[m.src],
            self.board[m.dst],
            dict(self.rights),
            self.ep,
            None,  # en-passant captured square (filled below)
        )
        p = self.board[m.src]
        white = p.isupper()
        ep_capture_sq = None

        self.board[m.dst] = p
        self.board[m.src] = "."

        if p.upper() == "P":
            if m.dst == self.ep and undo[2] == ".":
                ep_capture_sq = m.dst + (8 if white else -8)
                undo = undo[:5] + ((ep_capture_sq, self.board[ep_capture_sq]),)
                self.board[ep_capture_sq] = "."
            if m.promo:
                self.board[m.dst] = m.promo.upper() if white else m.promo

        # castling: move the rook too
        if p.upper() == "K" and abs(m.dst - m.src) == 2:
            row = m.src // 8
            if m.dst % 8 == 6:  # king side
                self.board[sq(row, 5)] = self.board[sq(row, 7)]
                self.board[sq(row, 7)] = "."
            else:
                self.board[sq(row, 3)] = self.board[sq(row, 0)]
                self.board[sq(row, 0)] = "."

        # rights updates
        if p == "K":
            self.rights["K"] = self.rights["Q"] = False
        elif p == "k":
            self.rights["k"] = self.rights["q"] = False
        for s_, keys in ((63, "K"), (56, "Q"), (7, "k"), (0, "q")):
            if m.src == s_ or m.dst == s_:
                self.rights[keys] = False

        # en passant target
        self.ep = None
        if p.upper() == "P" and abs(m.dst - m.src) == 16:
            self.ep = (m.src + m.dst) // 2

        self.turn = "b" if self.turn == "w" else "w"
        return undo

    def _undo(self, undo):
        m, src_p, dst_p, rights, ep, ep_cap = undo
        self.board[m.src] = src_p
        self.board[m.dst] = dst_p
        if ep_cap is not None:
            s_, p_ = ep_cap
            self.board[s_] = p_
        if src_p.upper() == "K" and abs(m.dst - m.src) == 2:
            row = m.src // 8
            if m.dst % 8 == 6:
                self.board[sq(row, 7)] = self.board[sq(row, 5)]
                self.board[sq(row, 5)] = "."
            else:
                self.board[sq(row, 0)] = self.board[sq(row, 3)]
                self.board[sq(row, 3)] = "."
        self.rights = rights
        self.ep = ep
        self.turn = "b" if self.turn == "w" else "w"

    def push(self, m: Move) -> None:
        self._apply(m)
        self.last_move = (m.src, m.dst)

    # -- SAN / PGN -------------------------------------------------------
    def push_san(self, san: str) -> None:
        m = self.parse_san(san)
        if m is None:
            raise ValueError(f"Illegal or unparseable SAN {san!r} in {self.full_fen()}")
        self.push(m)

    def parse_san(self, san: str) -> Move | None:
        san = san.strip().rstrip("+#!?")
        if san in ("O-O", "0-0"):
            row = 7 if self.turn == "w" else 0
            target = sq(row, 6)
            return next(
                (m for m in self.legal_moves()
                 if self.board[m.src].upper() == "K" and m.dst == target
                 and abs(m.dst - m.src) == 2),
                None,
            )
        if san in ("O-O-O", "0-0-0"):
            row = 7 if self.turn == "w" else 0
            target = sq(row, 2)
            return next(
                (m for m in self.legal_moves()
                 if self.board[m.src].upper() == "K" and m.dst == target
                 and abs(m.dst - m.src) == 2),
                None,
            )
        match = re.match(
            r"^([KQRBN])?([a-h])?([1-8])?x?([a-h][1-8])(=?([QRBN]))?$", san
        )
        if not match:
            return None
        piece, file_d, rank_d, target, _, promo = match.groups()
        piece = piece or "P"
        dst = name_sq(target)
        promo = (promo or "").lower()
        for m in self.legal_moves():
            if m.dst != dst:
                continue
            if self.board[m.src].upper() != piece:
                continue
            if file_d and FILES[m.src % 8] != file_d:
                continue
            if rank_d and str(8 - m.src // 8) != rank_d:
                continue
            if (m.promo or "") != promo:
                continue
            return m
        return None


_MOVE_TOKEN = re.compile(
    r"(O-O-O|O-O|0-0-0|0-0|[KQRBN]?[a-h]?[1-8]?x?[a-h][1-8](=[QRBN])?[+#]?)"
)


def strip_pgn_movetext(movetext: str) -> list[str]:
    """Extract SAN tokens from PGN movetext (comments/variations removed)."""
    movetext = re.sub(r"\{[^}]*\}", " ", movetext)
    while "(" in movetext:
        movetext = re.sub(r"\([^()]*\)", " ", movetext)
    movetext = re.sub(r"\$\d+", " ", movetext)
    movetext = re.sub(r"\d+\.(\.\.)?", " ", movetext)
    movetext = re.sub(r"(1-0|0-1|1/2-1/2|\*)", " ", movetext)
    return [m.group(0).rstrip("+#") for m in _MOVE_TOKEN.finditer(movetext)]


def replay_pgn_game(movetext: str) -> list[Game]:
    """Replay one game's movetext; returns the Game after each ply (snapshots
    are the same object — callers should extract FENs immediately)."""
    game = Game()
    states = []
    for san in strip_pgn_movetext(movetext):
        game.push_san(san)
        states.append(game)
    return states
