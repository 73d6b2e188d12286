"""Streaming shard datasets with host-side augmentation + device prefetch.

Replaces the reference's tar/FLAC IterableDatasets + DataLoader worker pool
(reference: st_ito/dataset/dataset_param.py:40-237):
- shards are visited in random order, examples within a shard shuffled
- independent random crops of input and output (reference: :176-201)
- per-side random gain 0..-32 dB (reference: :218-227)
- random LR channel flip (reference: :230-232)
- ``prefetch_batches`` overlaps host batch assembly with device compute via
  a background thread (the DataLoader-worker equivalent).
"""

from __future__ import annotations

import glob
import json
import os
import queue
import threading
from typing import Iterator

import numpy as np


class NpzShardDataset:
    """Pretext dataset over .npz shards written by generate_pretext_dataset."""

    def __init__(
        self,
        shard_dir: str,
        length: int = 262144,
        batch_size: int = 32,
        seed: int = 0,
        random_gain: bool = True,
        random_flip: bool = True,
        independent_crops: bool = True,
    ):
        self.paths = sorted(glob.glob(os.path.join(shard_dir, "shard_*.npz")))
        if not self.paths:
            raise FileNotFoundError(f"no shards in {shard_dir}")
        index_path = os.path.join(shard_dir, "index.json")
        self.meta = {}
        if os.path.isfile(index_path):
            with open(index_path) as f:
                self.meta = json.load(f)
        self.length = length
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.random_gain = random_gain
        self.random_flip = random_flip
        self.independent_crops = independent_crops

    def _crop(self, x: np.ndarray) -> np.ndarray:
        T = x.shape[-1]
        L = self.length
        if T == L:
            return x
        if T < L:
            out = np.zeros(x.shape[:-1] + (L,), x.dtype)
            out[..., :T] = x
            return out
        s = int(self.rng.integers(0, T - L))
        return x[..., s:s + L]

    def _augment(self, x: np.ndarray) -> np.ndarray:
        if self.random_gain:
            gain_db = -self.rng.random(x.shape[0]) * 32.0
            x = x * (10 ** (gain_db / 20.0))[:, None, None]
        if self.random_flip and x.shape[1] == 2:
            flip = self.rng.random(x.shape[0]) < 0.5
            x[flip] = x[flip][:, ::-1, :]
        return x

    def __iter__(self) -> Iterator[dict]:
        order = self.rng.permutation(len(self.paths))
        carry: dict | None = None
        for pi in order:
            with np.load(self.paths[pi]) as d:
                inputs = d["inputs"].astype(np.float32)
                outputs = d["outputs"].astype(np.float32)
                inst = d["instance_index"]
                pre = d["preset_index"]
                tar = d["tar_index"]
            perm = self.rng.permutation(len(inputs))
            inputs, outputs = inputs[perm], outputs[perm]
            inst, pre, tar = inst[perm], pre[perm], tar[perm]

            if self.independent_crops:
                inputs = np.stack([self._crop(x) for x in inputs])
                outputs = np.stack([self._crop(y) for y in outputs])
            else:
                inputs = self._crop(inputs)
                outputs = self._crop(outputs)

            inputs = self._augment(inputs)
            outputs = self._augment(outputs)

            batch = {
                "inputs": inputs, "outputs": outputs,
                "instance_index": inst.astype(np.int32),
                "preset_index": pre.astype(np.int32),
                "tar_index": tar.astype(np.int32),
            }
            if carry is not None:
                batch = {k: np.concatenate([carry[k], batch[k]]) for k in batch}
                carry = None
            n = len(batch["inputs"])
            full = (n // self.batch_size) * self.batch_size
            for s in range(0, full, self.batch_size):
                yield {k: v[s:s + self.batch_size] for k, v in batch.items()}
            if full < n:
                carry = {k: v[full:] for k, v in batch.items()}


class StyleShardDataset:
    """Style triplets (input, output, params); input_only mode for the
    on-the-fly trainer (reference: dataset_style.py:85-93)."""

    def __init__(self, shard_dir: str, length: int = 131072,
                 batch_size: int = 16, seed: int = 0,
                 input_only: bool = False):
        self.paths = sorted(glob.glob(os.path.join(shard_dir, "shard_*.npz")))
        if not self.paths:
            raise FileNotFoundError(f"no shards in {shard_dir}")
        self.length = length
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.input_only = input_only

    def __iter__(self) -> Iterator[dict]:
        order = self.rng.permutation(len(self.paths))
        for pi in order:
            with np.load(self.paths[pi]) as d:
                inputs = d["inputs"].astype(np.float32)
                outputs = d["outputs"].astype(np.float32)
                params = d["params"].astype(np.float32)
            perm = self.rng.permutation(len(inputs))
            inputs, outputs, params = inputs[perm], outputs[perm], params[perm]
            T = inputs.shape[-1]
            if T > self.length:
                s = int(self.rng.integers(0, T - self.length))
                inputs = inputs[..., s:s + self.length]
                outputs = outputs[..., s:s + self.length]
            for s in range(0, len(inputs) - self.batch_size + 1, self.batch_size):
                sl = slice(s, s + self.batch_size)
                batch = {"input_audio": inputs[sl], "target_params": params[sl]}
                if self.input_only:
                    batch["target_audio"] = inputs[sl]  # placeholder, rendered on the fly
                else:
                    batch["target_audio"] = outputs[sl]
                yield batch


def prefetch_batches(iterable, buffer_size: int = 2) -> Iterator:
    """Run the (host-side) batch iterator in a background thread."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    _END = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
