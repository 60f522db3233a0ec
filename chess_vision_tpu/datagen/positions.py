"""Position sources for synthetic dataset generation.

Two sources, mirroring the reference's (datagen/positions.js):
  - random_position: both kings on distinct squares, 0-28 extra random
    pieces, no pawns on ranks 1/8, turn "w", castling "-", legal=False
    (reference positions.js:13-58)
  - game_positions: positions sampled from self-played pseudo-random games
    using the built-in move generator (chess_vision_tpu.datagen.chessrules),
    collecting every intermediate position with true turn/castling/en-passant
    — the offline-capable equivalent of the reference's PGN replay
    (positions.js:127-160), which required downloaded Lichess PGNs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from chess_vision_tpu.fen import labels_to_fen

_PIECES = "PNBRQKpnbrqk"
_NON_KING = "PNBRQpnbrq"


@dataclass
class Position:
    placement: str  # board-placement FEN
    turn: str = "w"
    castling: str = "-"
    en_passant: str = "-"
    legal: bool = False
    last_move: tuple | None = None  # (src, dst) squares of the last ply

    @property
    def full_fen(self) -> str:
        return f"{self.placement} {self.turn} {self.castling} {self.en_passant}"

    @property
    def piece_count(self) -> int:
        return sum(1 for ch in self.placement if ch.isalpha())


def random_position(rng: np.random.Generator) -> Position:
    """Random (usually illegal) position with exactly two kings."""
    board = np.zeros(64, np.int32)  # class ids, 0 = empty
    wk, bk = rng.choice(64, size=2, replace=False)
    board[wk] = 6   # K
    board[bk] = 12  # k

    n_extra = int(rng.integers(0, 29))
    empty = [i for i in range(64) if board[i] == 0]
    rng.shuffle(empty)
    placed = 0
    for sq in empty:
        if placed >= n_extra:
            break
        piece = _NON_KING[int(rng.integers(0, len(_NON_KING)))]
        # no pawns on ranks 8 (indices 0-7) or 1 (indices 56-63)
        if piece in "Pp" and (sq < 8 or sq >= 56):
            continue
        from chess_vision_tpu.fen import PIECE_TO_INDEX

        board[sq] = PIECE_TO_INDEX[piece]
        placed += 1

    return Position(placement=labels_to_fen(board))


_PIECE_VALUE = {"P": 1.0, "N": 3.0, "B": 3.2, "R": 5.0, "Q": 9.0, "K": 0.0}


def _score_move(game, m, ply: int) -> float:
    """Cheap human-plausibility score for softmax move sampling.

    Uniform-random self-play produces castling statistics unlike real games
    (the round-3 full_fen deficit traced to the castling/turn heads): kings
    wander early, rights die without castling ever happening, and boards
    where K+R sit on their start squares without rights — visually
    unknowable labels — are common. This pushes games toward the real-game
    shape the reference trains on via Lichess PGNs (positions.js:127-160):
    develop minors, castle when available, keep king/rooks home early."""
    piece = game.board[m.src]
    kind = piece.upper()
    captured = game.board[m.dst]
    s = 0.0
    if kind == "K":
        if abs((m.src % 8) - (m.dst % 8)) == 2:
            s += 9.0                        # castling: strongly preferred
        else:
            s -= 5.0 if ply < 40 else 1.0   # pointless king walks
    if captured != ".":
        s += 1.0 + 0.6 * _PIECE_VALUE[captured.upper()]
    if ply < 20:
        if kind in ("N", "B"):
            s += 1.5                        # development
        elif kind == "P":
            s += 1.0 if (m.src % 8) in (3, 4) else 0.3
        elif kind == "Q":
            s -= 1.0
    if kind == "R" and ply < 24:
        s -= 2.0                            # preserve rights until castled
    if m.promo:
        s += 2.0 if m.promo.lower() == "q" else -1.5
    return s


def game_positions(
    rng: np.random.Generator,
    n_games: int,
    max_plies: int = 120,
    policy: str = "human",
) -> list[Position]:
    """All intermediate positions of self-played legal games.

    policy="human": moves sampled from a softmax over _score_move (castling
    happens in most games, rights persist realistically). policy="uniform":
    the round-1..3 behavior, uniform over legal moves."""
    from chess_vision_tpu.datagen.chessrules import Game

    out: list[Position] = []
    for _ in range(n_games):
        game = Game()
        for _ply in range(max_plies):
            moves = game.legal_moves()
            if not moves:
                break
            if policy == "human" and len(moves) > 1:
                scores = np.array(
                    [_score_move(game, m, _ply) for m in moves])
                p = np.exp((scores - scores.max()) / 1.25)
                p /= p.sum()
                choice = int(rng.choice(len(moves), p=p))
            else:
                choice = int(rng.integers(0, len(moves)))
            game.push(moves[choice])
            out.append(
                Position(
                    placement=game.placement_fen(),
                    turn=game.turn,
                    castling=game.castling_fen(),
                    en_passant=game.en_passant_fen(),
                    legal=True,
                    last_move=game.last_move,
                )
            )
    return out


def iter_pgn_games(path: str, chunk_bytes: int = 4 * 1024 * 1024):
    """Stream movetext blocks from a (possibly multi-GB) PGN file without
    loading it into memory (reference loadPgnGames, positions.js:65-106).

    Yields the movetext string of each complete game.
    """
    buf = ""
    with open(path, "r", errors="replace") as f:
        while True:
            chunk = f.read(chunk_bytes)
            if not chunk:
                break
            buf += chunk
            # A game = header block ([Tags]) + movetext; games are separated
            # by the next "[Event " tag. Keep the trailing partial game.
            while True:
                start = buf.find("[Event ")
                if start < 0:
                    break
                nxt = buf.find("[Event ", start + 1)
                if nxt < 0:
                    break
                game = buf[start:nxt]
                buf = buf[nxt:]
                movetext = _movetext_of(game)
                if movetext:
                    yield movetext
    movetext = _movetext_of(buf)
    if movetext:
        yield movetext


def _movetext_of(game_block: str) -> str:
    lines = [
        ln for ln in game_block.splitlines()
        if ln.strip() and not ln.lstrip().startswith("[")
    ]
    return " ".join(lines)


def positions_from_pgn(
    path: str,
    rng: np.random.Generator,
    count: int,
    max_games: int | None = None,
) -> list[Position]:
    """Replay games from a PGN file, pool every intermediate position, and
    sample `count` of them (reference extractAllPositions + samplePositions,
    positions.js:127-196). Unparseable games are skipped."""
    from chess_vision_tpu.datagen.chessrules import Game, strip_pgn_movetext

    pool: list[Position] = []
    n_games = 0
    for movetext in iter_pgn_games(path):
        game = Game()
        try:
            for san in strip_pgn_movetext(movetext):
                game.push_san(san)
                pool.append(
                    Position(
                        placement=game.placement_fen(),
                        turn=game.turn,
                        castling=game.castling_fen(),
                        en_passant=game.en_passant_fen(),
                        legal=True,
                        last_move=game.last_move,
                    )
                )
        except ValueError:
            continue  # skip malformed games
        n_games += 1
        if max_games is not None and n_games >= max_games:
            break
        if len(pool) >= count * 10:  # enough diversity; stop reading
            break
    if not pool:
        raise ValueError(f"No parseable games in {path}")
    idx = rng.permutation(len(pool))[: min(count, len(pool))]
    out = [pool[i] for i in idx]
    while len(out) < count:  # small files: sample with replacement
        out.append(pool[int(rng.integers(0, len(pool)))])
    return out


def sample_positions(
    rng: np.random.Generator,
    count: int,
    source: str = "random",
    positions_per_game: float = 40.0,
    pgn_path: str | None = None,
    policy: str = "human",
) -> list[Position]:
    if source == "random":
        return [random_position(rng) for _ in range(count)]
    if source == "game":
        pool: list[Position] = []
        while len(pool) < count:
            need = count - len(pool)
            n_games = max(1, int(np.ceil(need / positions_per_game)))
            pool.extend(game_positions(rng, n_games, policy=policy))
        idx = rng.permutation(len(pool))[:count]
        return [pool[i] for i in idx]
    if source == "pgn":
        if not pgn_path:
            raise ValueError("source 'pgn' requires a pgn path")
        return positions_from_pgn(pgn_path, rng, count)
    raise ValueError(f"Unknown position source: {source!r}")
