"""Genuine multi-process (2-rank gloo) coverage of the multi-host paths:
global-batch assembly from local rows, rank-0-gated checkpoint/metric
writes, npz save + cross-process resume, and the loader's shard slicing.

The reference's equivalent surface is Lightning DDP rank-awareness
(``distill.py:334-343``) and the rank-strided sampler slice
(``dataset/audio_dataset.py:196-211``).
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_two_process_trainer_end_to_end():
    """Spawn the 2-rank dryrun: full trainer loop + validation + resume."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py"), "dryrun_mp", "2"],
        capture_output=True, text=True, timeout=900,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multihost(2): ok" in proc.stdout, proc.stdout


def test_loader_shard_slicing():
    """DistillDataLoader(shard=(p, n)) decodes only this process's rows of
    each deterministic global batch (audio_dataset.py:210 rank stride is the
    reference analogue; here hosts own contiguous row blocks)."""
    from dphubert_tpu.data.loader import DistillDataLoader
    from dphubert_tpu.data.sampler import StaticShapeBatcher

    class StubDataset:
        def __init__(self, n, length):
            self.n, self.length = n, length

        def __len__(self):
            return self.n

        def load(self, i):
            return np.full((self.length,), float(i), np.float32)

    lengths = [40000] * 64
    batcher = StaticShapeBatcher(
        lengths, max_token_count=160000, min_len=32000, max_len=40000,
        num_shapes=2, seed=3, num_replicas=1,
    )
    ds = StubDataset(64, 40000)

    full = DistillDataLoader(ds, batcher, num_workers=0, rand_crop=False, seed=5)
    sh0 = DistillDataLoader(ds, batcher, num_workers=0, rand_crop=False,
                            seed=5, shard=(0, 2))
    sh1 = DistillDataLoader(ds, batcher, num_workers=0, rand_crop=False,
                            seed=5, shard=(1, 2))

    for (w, _), (w0, _), (w1, _) in zip(
        full.epoch(0), sh0.epoch(0), sh1.epoch(0)
    ):
        half = w.shape[0] // 2
        np.testing.assert_array_equal(w0, w[:half])
        np.testing.assert_array_equal(w1, w[half:])
