"""chess-vision-tpu: a TPU-native (JAX/XLA/Pallas/pjit) chess-position
recognition framework with the capabilities of the cloudui/chess-vision
reference: full-FEN prediction (64x13 piece placement, side to move, castling
rights) from 2D board screenshots via three interchangeable architectures.
"""

from chess_vision_tpu.fen import (  # noqa: F401
    CLASS_TO_COLOR,
    CLASS_TO_TYPE,
    INDEX_TO_PIECE,
    NUM_CLASSES,
    NUM_PIECE_COLORS,
    NUM_PIECE_TYPES,
    NUM_SQUARES,
    PIECE_TO_INDEX,
    assemble_fen,
    assemble_fens_batch,
    fen_to_labels,
    filename_to_fen,
    flip_fen,
    labels_to_fen,
    parse_full_fen,
)

__version__ = "0.1.0"
