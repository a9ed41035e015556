"""Generate a synthetic LibriSpeech-layout WAV corpus for full-recipe runs.

The TPU environment has no LibriSpeech mirror (zero egress), so full-scale
wall-clock/convergence demonstrations of the 4-stage pipeline (run.sh) use a
synthetic corpus with the same on-disk layout the reference's
``prepare_data.py`` expects: ``<root>/train-clean-100/<spk>/<chap>/*.wav``
and ``<root>/dev-clean/...``.  Utterance lengths are drawn to populate the
top rungs of the StaticShapeBatcher ladder so steady-state batches match the
published per-chip audio budget.

Usage::

    python tools/make_synth_corpus.py --out /path/corpus \
        --n_train 4000 --n_dev 24
    python -m dphubert_tpu.cli.prepare_data --data /path/corpus \
        --out /path/tsv --extension wav
"""

from __future__ import annotations

import argparse
import pathlib
import struct

import numpy as np


def write_wav(path: pathlib.Path, wave: np.ndarray, sr: int = 16000) -> None:
    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


def _sample_length(rng: np.random.Generator) -> int:
    # 60% on the ladder's 207360 rung (B=12 at the 160 s budget), 40% on
    # the 171840 rung (B=14): two static shapes <=648 encoder frames cover
    # the whole run
    if rng.random() < 0.6:
        return int(rng.integers(208_000, 249_600))
    return int(rng.integers(172_480, 207_359))


def synth_utterance(rng: np.random.Generator, n: int) -> np.ndarray:
    # speech-ish spectrum beats white noise for realism at equal cost: a few
    # band-limited harmonics + noise floor, amplitude-modulated
    t = np.arange(n, dtype=np.float32) / 16000.0
    f0 = float(rng.uniform(80, 260))
    sig = np.zeros(n, dtype=np.float32)
    for h in range(1, 5):
        sig += rng.uniform(0.1, 0.5) / h * np.sin(
            2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi)
        ).astype(np.float32)
    sig *= 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(2, 6) * t).astype(np.float32)
    sig += 0.05 * rng.standard_normal(n).astype(np.float32)
    return 0.2 * sig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=pathlib.Path, required=True)
    ap.add_argument("--n_train", type=int, default=4000)
    ap.add_argument("--n_dev", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--files_per_dir", type=int, default=100)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    total_sec = 0.0
    for subset, count in (("train-clean-100", args.n_train), ("dev-clean", args.n_dev)):
        for i in range(count):
            d = args.out / subset / str(i // args.files_per_dir) / "0"
            d.mkdir(parents=True, exist_ok=True)
            n = _sample_length(rng)
            total_sec += n / 16000.0
            write_wav(d / f"u{i:05d}.wav", synth_utterance(rng, n))
    print(f"wrote {args.n_train}+{args.n_dev} files, {total_sec/3600:.2f} h audio, "
          f"under {args.out}")


if __name__ == "__main__":
    main()
