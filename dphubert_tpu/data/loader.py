"""Dataset + prefetching loader.

``AudioDataset`` mirrors the reference's manifest-driven dataset
(``audio_dataset.py:220-280``): decode a waveform, assert the manifest
length.  ``DistillDataLoader`` is the TPU feed: a background thread pool
decodes + random-crops the next batches to their bucket's static shape while
the device computes, and batches are handed to jit as numpy arrays (the
train step's data sharding places them across the mesh).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np

from .audio import load_audio
from .manifest import read_manifest
from .sampler import StaticShapeBatcher


class AudioDataset:
    def __init__(self, tsv_dir, subset: str) -> None:
        self.f_list, self.ind_list, self.len_list = read_manifest(tsv_dir, subset)

    def __len__(self) -> int:
        return len(self.f_list)

    def load(self, index: int) -> np.ndarray:
        wave, _sr = load_audio(self.f_list[index])
        if wave.shape[1] != self.len_list[index]:
            raise ValueError(
                f"manifest length {self.len_list[index]} != decoded "
                f"{wave.shape[1]} for {self.f_list[index]}"
            )
        return wave[0]  # mono channel 0, like torchaudio.load()[0][0]


def crop_to(wave: np.ndarray, num_frames: int, rng: np.random.Generator,
            rand_crop: bool = True) -> np.ndarray:
    """Random-offset crop (reference ``_crop_audio``,
    audio_dataset.py:283-312)."""
    if wave.shape[0] > num_frames:
        offset = int(rng.integers(wave.shape[0] - num_frames)) if rand_crop else 0
        return wave[offset : offset + num_frames]
    return wave


class DistillDataLoader:
    """Epoch iterator producing (waveforms (B, T) float32, lengths or None).

    All samples in a batch are cropped to the batch's rung length, so
    lengths are uniform and the attention-mask path is skipped during
    training — the same semantics as the reference's crop-to-min collate
    (``lightning.py:321``), with a closed shape set for XLA.
    """

    def __init__(
        self,
        dataset: AudioDataset,
        batcher: StaticShapeBatcher,
        *,
        num_workers: int = 8,
        prefetch: int = 4,
        rand_crop: bool = True,
        seed: int = 0,
        shard: Optional[Tuple[int, int]] = None,  # (process_index, count)
        feed_dtype: str = "float32",
    ) -> None:
        self.dataset = dataset
        self.batcher = batcher
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.rand_crop = rand_crop
        self.seed = seed
        # multi-host: decode only the rows this process's devices own; the
        # batch order is deterministic so all hosts agree on the global batch
        self.shard = shard
        # "int16": feed PCM-scale integers and let the (jitted) train step
        # divide by 32768 on device — bit-identical to the float32 feed for
        # int16-sourced audio (WAV/FLAC), at half the host->device bytes.
        # The feed link is the step-time bottleneck when the accelerator is
        # remote (PCIe is fine; a tunnel is not).
        if feed_dtype not in ("float32", "int16"):
            raise ValueError(feed_dtype)
        self.feed_dtype = feed_dtype

    def _make_batch(self, rung: int, idx: np.ndarray, rng: np.random.Generator):
        if self.shard is not None:
            p, n = self.shard
            local = len(idx) // n
            idx = idx[p * local : (p + 1) * local]
        int16 = self.feed_dtype == "int16"
        out = np.empty((len(idx), rung), dtype=np.int16 if int16 else np.float32)
        for row, i in enumerate(idx):
            w = crop_to(self.dataset.load(int(i)), rung, rng, self.rand_crop)
            # float came from PCM/32768, so *32768 recovers the exact
            # integers (clip guards non-PCM synthetic sources)
            out[row] = (
                np.clip(w * 32768.0, -32768, 32767).astype(np.int16)
                if int16 else w
            )
        return out

    def epoch(self, epoch: int, skip: int = 0
              ) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """Iterate one epoch's batches; ``skip`` drops the first k batches
        without decoding them (checkpoint resume mid-epoch) while keeping
        the remaining batches' crop randomness identical to an
        uninterrupted epoch — each batch's rng seed is derived from its
        position, not from how many batches were actually produced."""
        batches = self.batcher.epoch_batches(epoch)
        rng = np.random.default_rng(self.seed + 7919 * epoch)
        # per-batch independent rng keeps decode order (and resume skips)
        # irrelevant to the crop stream
        seeds = [int(rng.integers(2**63)) for _ in batches]
        batches, seeds = batches[skip:], seeds[skip:]
        if self.num_workers <= 0:
            for (rung, idx), seed in zip(batches, seeds):
                yield self._make_batch(rung, idx, np.random.default_rng(seed)), None
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                futures = []
                for (rung, idx), seed in zip(batches, seeds):
                    if stop.is_set():
                        break
                    brng = np.random.default_rng(seed)
                    futures.append(pool.submit(self._make_batch, rung, idx, brng))
                    while len(futures) >= self.prefetch:
                        q.put(futures.pop(0).result())
                for f in futures:
                    if stop.is_set():
                        f.cancel()
                    else:
                        q.put(f.result())
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item, None
        finally:
            stop.set()

    def __len__(self) -> int:
        return len(self.batcher.epoch_batches(0))
