"""Batched JPEG -> FEN serving path (reference predict.py scaled up).

Pipeline: host thread-pool JPEG decode -> uint8 NHWC batches -> device
(normalize + bf16 forward + argmax in ONE jitted program, so only 69 bytes of
results per board cross back) -> host FEN assembly. Decode, H2D, device
compute, and FEN assembly all overlap via a bounded in-flight window.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from chess_vision_tpu.config import get_data_config
from chess_vision_tpu.fen import assemble_fens_batch
from chess_vision_tpu.models import abstract_variables, build_model
from chess_vision_tpu.utils.checkpoint import load_checkpoint, restore_tree


def make_infer_fn(model, mean, std):
    """uint8 (B,S,S,3) -> (square ids u8 (B,64), turn bool (B,), castling bool (B,4)).

    Preprocessing runs as the fused Pallas dequant+normalize kernel on TPU
    (ops/preprocess.py), XLA elsewhere.
    """
    from chess_vision_tpu.ops.preprocess import preprocess_u8

    def forward(params, batch_stats, u8):
        x = preprocess_u8(u8, mean, std, jnp.bfloat16)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, x, train=False)
        preds = jnp.argmax(out["squares"].reshape(-1, 64, 13), axis=-1)
        return (
            preds.astype(jnp.uint8),
            out["turn"][:, 0] > 0,
            out["castling"] > 0,
        )

    return jax.jit(forward)


class Predictor:
    """Load a checkpoint once, predict FENs for images at max throughput."""

    def __init__(self, checkpoint_path: str, batch_size: int = 256,
                 decode_workers: int = 8, inflight: int = 4):
        ckpt = load_checkpoint(checkpoint_path)
        self.cfg = ckpt["config"]
        self.model = build_model(self.cfg)
        self.input_size = self.cfg["model"].get("input_size") or 224
        variables = abstract_variables(self.model, self.input_size)
        self.params = restore_tree(variables["params"], ckpt["params"])
        self.batch_stats = restore_tree(
            variables.get("batch_stats", {}), ckpt.get("batch_stats", {})
        )
        data_cfg = get_data_config(self.cfg["model"]["name"])
        self.infer = make_infer_fn(self.model, data_cfg["mean"], data_cfg["std"])
        self.batch_size = batch_size
        self.decode_workers = decode_workers
        self.inflight = inflight

    def _decode(self, path: str) -> np.ndarray:
        from chess_vision_tpu import native

        out = native.decode_file(path, self.input_size)
        if out is not None:
            return out
        from PIL import Image

        img = Image.open(path).convert("RGB")
        if img.size != (self.input_size, self.input_size):
            img = img.resize((self.input_size, self.input_size), Image.BILINEAR)
        return np.asarray(img, np.uint8)

    def predict_array(self, images_u8: np.ndarray) -> list[str]:
        """uint8 (N,S,S,3) -> N FEN strings (padding the tail batch)."""
        n = images_u8.shape[0]
        fens: list[str] = []
        window: list[tuple] = []

        def drain_one():
            count, out = window.pop(0)
            preds, turn, castling = (np.asarray(o) for o in out)
            fens.extend(
                assemble_fens_batch(preds[:count], turn[:count], castling[:count])
            )

        for start in range(0, n, self.batch_size):
            chunk = images_u8[start : start + self.batch_size]
            count = chunk.shape[0]
            if count < self.batch_size:
                pad = np.repeat(chunk[-1:], self.batch_size - count, axis=0)
                chunk = np.concatenate([chunk, pad])
            dev = jax.device_put(chunk)
            window.append((count, self.infer(self.params, self.batch_stats, dev)))
            if len(window) >= self.inflight:
                drain_one()
        while window:
            drain_one()
        return fens

    def predict_files(self, paths: list[str]) -> list[str]:
        """Streaming JPEG->FEN: decode overlaps device compute."""
        fens: list[str] = []
        window: list[tuple] = []
        batch_q: queue.Queue = queue.Queue(maxsize=self.inflight)

        def producer():
            with ThreadPoolExecutor(self.decode_workers) as pool:
                for start in range(0, len(paths), self.batch_size):
                    chunk_paths = paths[start : start + self.batch_size]
                    imgs = np.stack(list(pool.map(self._decode, chunk_paths)))
                    batch_q.put(imgs)
            batch_q.put(None)

        threading.Thread(target=producer, daemon=True).start()

        def drain_one():
            count, out = window.pop(0)
            preds, turn, castling = (np.asarray(o) for o in out)
            fens.extend(
                assemble_fens_batch(preds[:count], turn[:count], castling[:count])
            )

        while True:
            imgs = batch_q.get()
            if imgs is None:
                break
            count = imgs.shape[0]
            if count < self.batch_size:
                pad = np.repeat(imgs[-1:], self.batch_size - count, axis=0)
                imgs = np.concatenate([imgs, pad])
            dev = jax.device_put(imgs)
            window.append((count, self.infer(self.params, self.batch_stats, dev)))
            if len(window) >= self.inflight:
                drain_one()
        while window:
            drain_one()
        return fens
