"""Full evaluation suite (parity with reference evaluate.py:48-287).

Overall loss/square/board accuracy; turn + castling + full-FEN metrics masked
to legal==1 samples; per-piece accuracy; 13x13 piece confusion; 2x2 turn
confusion; top-10 worst boards with true/pred FENs; grouped metrics by
manifest fields. Confusions and counts accumulate on device; only per-sample
predictions (B x 64 int8) cross to host per batch.
"""

from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from chess_vision_tpu.augment import preprocess_eval_batch
from chess_vision_tpu.fen import INDEX_TO_PIECE, NUM_CLASSES, labels_to_fen
from chess_vision_tpu.parallel.mesh import shard_batch
from chess_vision_tpu.train.losses import weighted_smoothed_cross_entropy

PIECE_NAMES = {i: ("empty" if i == 0 else INDEX_TO_PIECE[i]) for i in range(NUM_CLASSES)}
CASTLING_NAMES = ["K", "Q", "k", "q"]


def piece_count_bucket(count) -> str:
    count = int(count)
    if count <= 10:
        return "endgame (2-10)"
    if count <= 20:
        return "midgame (11-20)"
    return "opening (21-32)"


def castling_category(castling_str: str) -> str:
    return "none" if castling_str == "-" else "has_rights"


def make_eval_batch_fn(model, mean, std):
    def eval_batch(params, batch_stats, batch):
        images = preprocess_eval_batch(batch, mean, std)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, images, train=False)

        sq_logits = out["squares"].reshape(-1, 64, NUM_CLASSES)
        sq_labels = batch["squares"]
        mask = batch["mask"]
        legal = batch["legal"][:, 0] * mask

        preds = jnp.argmax(sq_logits, axis=-1)
        sq_correct = (preds == sq_labels) | (mask[:, None] == 0)
        board_correct = jnp.all(preds == sq_labels, axis=1) & (mask > 0)

        # plain unweighted CE on real rows (reference evaluate.py:50,96)
        piece_loss = weighted_smoothed_cross_entropy(
            sq_logits.reshape(-1, NUM_CLASSES),
            sq_labels.reshape(-1),
            sample_mask=jnp.repeat(mask, 64),
        )

        turn_pred = (out["turn"] > 0).astype(jnp.float32)
        turn_correct = (turn_pred == batch["turn"])[:, 0]
        castling_pred = (out["castling"] > 0).astype(jnp.float32)
        castling_right_correct = castling_pred == batch["castling"]
        castling_all_correct = jnp.all(castling_right_correct, axis=1)

        # 13x13 confusion over real rows
        m64 = jnp.repeat(mask, 64).astype(jnp.int32)
        conf = jnp.zeros((NUM_CLASSES, NUM_CLASSES), jnp.int32).at[
            sq_labels.reshape(-1), preds.reshape(-1)
        ].add(m64)

        # 2x2 turn confusion over legal rows
        t_true = batch["turn"][:, 0].astype(jnp.int32)
        t_pred = turn_pred[:, 0].astype(jnp.int32)
        turn_conf = jnp.zeros((2, 2), jnp.int32).at[t_true, t_pred].add(
            legal.astype(jnp.int32)
        )

        lg = legal
        return {
            "preds": preds.astype(jnp.int8),
            "board_correct": board_correct,
            "turn_correct_mask": turn_correct > 0,
            "castling_all_correct_mask": castling_all_correct,
            "num_wrong": jnp.sum((preds != sq_labels), axis=1) * (mask > 0),
            "conf": conf,
            "turn_conf": turn_conf,
            "loss_sum": piece_loss * jnp.sum(mask),
            "squares_correct": jnp.sum(sq_correct * mask[:, None]),
            "boards_correct": jnp.sum(board_correct),
            "turn_correct_legal": jnp.sum(turn_correct * lg),
            "castling_right_correct_legal": jnp.sum(
                castling_right_correct * lg[:, None], axis=0
            ),
            "castling_all_correct_legal": jnp.sum(castling_all_correct * lg),
            "full_fen_correct_legal": jnp.sum(
                board_correct & (turn_correct > 0) & castling_all_correct & (lg > 0)
            ),
            "n_legal": jnp.sum(lg),
            "n": jnp.sum(mask),
        }

    return jax.jit(eval_batch)


def evaluate(model, params, batch_stats, dataset, loader, mesh, mean, std,
             verbose: bool = True) -> dict:
    eval_batch = make_eval_batch_fn(model, mean, std)

    conf = np.zeros((NUM_CLASSES, NUM_CLASSES), np.int64)
    turn_conf = np.zeros((2, 2), np.int64)
    castling_right = np.zeros(4, np.float64)
    scalars = defaultdict(float)
    sample_results = []
    worst = []

    for batch in loader:
        indices = batch["indices"]
        n_real = batch["n_real"]
        device_batch = shard_batch(batch, mesh)
        out = eval_batch(params, batch_stats, device_batch)

        conf += np.asarray(out["conf"], np.int64)
        turn_conf += np.asarray(out["turn_conf"], np.int64)
        castling_right += np.asarray(out["castling_right_correct_legal"])
        for key in ("loss_sum", "squares_correct", "boards_correct",
                    "turn_correct_legal", "castling_all_correct_legal",
                    "full_fen_correct_legal", "n_legal", "n"):
            scalars[key] += float(out[key])

        preds = np.asarray(out["preds"])
        board_correct = np.asarray(out["board_correct"])
        num_wrong = np.asarray(out["num_wrong"])
        turn_ok = np.asarray(out["turn_correct_mask"])
        castling_ok = np.asarray(out["castling_all_correct_mask"])
        legal = batch["legal"][:, 0] > 0

        for i in range(n_real):
            idx = int(indices[i])
            result = {
                "idx": idx,
                "board_correct": bool(board_correct[i]),
                "squares_wrong": int(num_wrong[i]),
                "turn_correct": bool(turn_ok[i]) if legal[i] else None,
                "castling_correct": bool(castling_ok[i]) if legal[i] else None,
            }
            sample_results.append(result)
            if num_wrong[i] > 0:
                worst.append((
                    int(num_wrong[i]),
                    labels_to_fen(batch["squares"][i]),
                    labels_to_fen(preds[i]),
                    idx,
                ))

    n = max(scalars["n"], 1.0)
    n_legal = scalars["n_legal"]
    metrics = {
        "loss": scalars["loss_sum"] / n,
        "square_acc": scalars["squares_correct"] / (n * 64),
        "board_acc": scalars["boards_correct"] / n,
        "turn_acc": scalars["turn_correct_legal"] / max(n_legal, 1),
        "castling_acc": scalars["castling_all_correct_legal"] / max(n_legal, 1),
        "full_fen_acc": scalars["full_fen_correct_legal"] / max(n_legal, 1),
        "total_boards": int(n),
        "total_legal": int(n_legal),
    }

    if verbose:
        _print_report(metrics, conf, turn_conf, castling_right, worst)
        print_grouped_metrics(dataset, sample_results)

    return metrics


def _print_report(metrics, conf, turn_conf, castling_right, worst):
    # Deliberate format-parity port: this block (and print_grouped_metrics
    # below) mirrors the reference report text byte-for-byte (reference
    # evaluate.py:159-287) because identical report output is a stated parity
    # goal. The computation feeding it is redesigned (device-side confusion
    # matrices, one jitted program); only the console formatting is copied.
    n = metrics["total_boards"]
    n_legal = metrics["total_legal"]
    print("\n" + "=" * 60)
    print("EVALUATION RESULTS")
    print("=" * 60)

    total_squares = n * 64
    correct_squares = int(round(metrics["square_acc"] * total_squares))
    correct_boards = int(round(metrics["board_acc"] * n))
    print(f"\nOverall ({n} images, {n_legal} legal):")
    print(f"  Loss:            {metrics['loss']:.4f}")
    print(f"  Per-square acc:  {metrics['square_acc']:.4f} "
          f"({correct_squares}/{total_squares})")
    print(f"  Full-board acc:  {metrics['board_acc']:.4f} "
          f"({correct_boards}/{n})")

    if n_legal > 0:
        correct_turn = int(round(metrics["turn_acc"] * n_legal))
        print("\nTurn prediction (legal positions only):")
        print(f"  Accuracy:        {metrics['turn_acc']:.4f} "
              f"({correct_turn}/{n_legal})")
        print("  Confusion (rows=true, cols=pred):")
        print("             White  Black")
        print(f"    White  {turn_conf[0, 0]:>6d} {turn_conf[0, 1]:>6d}")
        print(f"    Black  {turn_conf[1, 0]:>6d} {turn_conf[1, 1]:>6d}")

        print("\nCastling prediction (legal positions only):")
        for r in range(4):
            acc = castling_right[r] / n_legal
            print(f"  {CASTLING_NAMES[r]:>1s}: {acc:.4f} "
                  f"({int(castling_right[r])}/{n_legal})")
        correct_castling = int(round(metrics["castling_acc"] * n_legal))
        print(f"  All-4-correct:   {metrics['castling_acc']:.4f} "
              f"({correct_castling}/{n_legal})")

        correct_full = int(round(metrics["full_fen_acc"] * n_legal))
        print("\nFull FEN accuracy (position + turn + castling, legal only):")
        print(f"  {metrics['full_fen_acc']:.4f} ({correct_full}/{n_legal})")
    else:
        print("\nNo legal positions in dataset — turn/castling metrics skipped.")

    print("\nPer-piece accuracy:")
    for c in range(NUM_CLASSES):
        total = conf[c].sum()
        if total > 0:
            correct = conf[c, c]
            print(f"  {PIECE_NAMES[c]:>5s}: {correct / total:.4f}  "
                  f"({correct}/{total})")

    print("\nConfusion matrix (rows=true, cols=predicted):")
    header = "       " + "".join(f"{PIECE_NAMES[c]:>6s}" for c in range(NUM_CLASSES))
    print(header)
    for t in range(NUM_CLASSES):
        row = f"  {PIECE_NAMES[t]:>4s} " + "".join(
            f"{conf[t, p]:>6d}" for p in range(NUM_CLASSES)
        )
        print(row)

    worst.sort(key=lambda x: -x[0])
    print("\nTop 10 worst predictions:")
    for num_wrong, fen_true, fen_pred, idx in worst[:10]:
        print(f"  Image {idx}: {num_wrong}/64 squares wrong")
        print(f"    True: {fen_true}")
        print(f"    Pred: {fen_pred}")


def print_grouped_metrics(dataset, sample_results):
    """Accuracy breakdowns grouped by manifest metadata fields
    (reference evaluate.py:233-287)."""
    if not getattr(dataset, "use_manifest", False) or not sample_results:
        return

    grouping_fields = {
        "piece_count": piece_count_bucket,
        "castling": castling_category,
        "turn": lambda x: "white" if x == "w" else "black",
        "has_highlight": lambda x: "highlighted" if x == "1" else "no highlight",
        "style": lambda x: x,
        "flipped": lambda x: "flipped" if x == "1" else "normal",
    }

    print("\n" + "=" * 60)
    print("GROUPED METRICS")
    print("=" * 60)

    for field, bucket_fn in grouping_fields.items():
        if field not in dataset.get_metadata(0):
            continue
        groups = defaultdict(lambda: {
            "total": 0, "board_correct": 0,
            "turn_correct": 0, "turn_total": 0,
            "castling_correct": 0, "castling_total": 0,
        })
        for result in sample_results:
            meta = dataset.get_metadata(result["idx"])
            bucket = bucket_fn(meta.get(field, ""))
            g = groups[bucket]
            g["total"] += 1
            g["board_correct"] += result["board_correct"]
            if result["turn_correct"] is not None:
                g["turn_total"] += 1
                g["turn_correct"] += result["turn_correct"]
            if result["castling_correct"] is not None:
                g["castling_total"] += 1
                g["castling_correct"] += result["castling_correct"]

        print(f"\nBy {field}:")
        for bucket in sorted(groups.keys()):
            g = groups[bucket]
            board_acc = g["board_correct"] / g["total"] if g["total"] else 0
            line = f"  {bucket:>20s}: board_acc={board_acc:.4f} (n={g['total']})"
            if g["turn_total"]:
                line += f"  turn={g['turn_correct'] / g['turn_total']:.4f}"
            if g["castling_total"]:
                line += (
                    f"  castling={g['castling_correct'] / g['castling_total']:.4f}"
                )
            print(line)
