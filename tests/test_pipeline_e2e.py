"""End-to-end 4-stage pipeline test on synthetic data:

prepare_data -> distill (stage 1, gates+Lagrangian) -> prune (surgery) ->
final_distill (stage 2) -> save_final_ckpt -> load_dpmodel,

all through the CLI entry points, on a tiny model and a handful of
synthesized WAV files.  This is the integration contract the reference
expresses as run.sh (``run.sh:45-115``).
"""

import struct
import sys

import numpy as np
import pytest

from dphubert_tpu.interop.torch_ckpt import load_checkpoint, save_checkpoint
from dphubert_tpu.params import flatten_params

from tests.test_forward_parity import _tiny_w2v2_config


def _write_wav(path, wave: np.ndarray, sr: int = 16000):
    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("librispeech")
    rng = np.random.default_rng(0)
    (root / "train-clean-100" / "1" / "2").mkdir(parents=True)
    (root / "dev-clean" / "3" / "4").mkdir(parents=True)
    for i in range(60):
        n = int(rng.integers(40_000, 80_000))
        _write_wav(
            root / "train-clean-100" / "1" / "2" / f"u{i:03d}.wav",
            0.1 * rng.standard_normal(n),
        )
    for i in range(12):
        n = int(rng.integers(40_000, 80_000))
        _write_wav(
            root / "dev-clean" / "3" / "4" / f"d{i:03d}.wav",
            0.1 * rng.standard_normal(n),
        )
    return root


@pytest.fixture(scope="module")
def teacher_ckpt(tmp_path_factory):
    import jax

    from dphubert_tpu import wav2vec2_model

    path = tmp_path_factory.mktemp("pretrained") / "teacher.pth"
    cfg = _tiny_w2v2_config()
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))
    save_checkpoint(
        path, cfg, flatten_params(jax.tree.map(np.asarray, params))
    )
    return path


def _run_cli(module, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        module.cli_main()
    finally:
        sys.argv = old


def test_full_pipeline(synth_data, teacher_ckpt, tmp_path):
    from dphubert_tpu.cli import (
        distill,
        final_distill,
        load_dpmodel,
        prepare_data,
        prune,
        save_final_ckpt,
    )

    tsv_dir = tmp_path / "tsv"
    exp1 = tmp_path / "stage1"
    exp2 = tmp_path / "stage2"

    # stage 0: manifests
    _run_cli(prepare_data, ["--data", str(synth_data), "--out", str(tsv_dir),
                            "--extension", "wav"])
    assert (tsv_dir / "train100.tsv").exists()
    lines = (tsv_dir / "train100.tsv").read_text().strip().splitlines()
    assert len(lines) == 61  # root + 60 rows

    common = [
        "--tsv_dir", str(tsv_dir),
        "--train_subset", "train100",
        "--seconds_per_batch", "20",
        "--num_workers", "2",
        "--num_shapes", "4",
        "--num_data_shards", "1",
        "--precision", "fp32",
        "--teacher_ckpt", str(teacher_ckpt),
        "--log_interval", "1",
        "--warmup_updates", "2",
        "--distill_layers", "0.1,3",
    ]

    # stage 1: joint distill + prune training
    _run_cli(distill, common + [
        "--student_ckpt", str(teacher_ckpt),
        "--exp_dir", str(exp1),
        "--max_updates", "4",
        "--sparsity_warmup_updates", "2",
        "--target_sparsity", "0.5",
        "--pruning_units", "conv,head,interm,attlayer,ffnlayer",
    ])
    distilled = exp1 / "ckpts" / "distilled.pth"
    assert distilled.exists()
    ck = load_checkpoint(distilled)
    assert any("hard_concrete" in k for k in ck["state_dict"])
    assert "distill_linear_projs" in ck

    # stage 1.5: surgery
    _run_cli(prune, ["--distilled_ckpt", str(distilled),
                     "--original_ckpt", str(teacher_ckpt)])
    pruned = distilled.parent / "pruned_hubert_base.pth"
    assert pruned.exists()
    pk = load_checkpoint(pruned)
    assert not any("hard_concrete" in k for k in pk["state_dict"])
    assert pk["config"]["extractor_prune_conv_channels"] is False

    # stage 2: final distill from the pruned student
    _run_cli(final_distill, common + [
        "--student_ckpt", str(pruned),
        "--exp_dir", str(exp2),
        "--max_updates", "2",
    ])
    distilled2 = exp2 / "ckpts" / "distilled.pth"
    assert distilled2.exists()

    # stage 3: merge + export
    _run_cli(save_final_ckpt, [
        "--config_path", str(pruned),
        "--ckpt_after_final_distill", str(distilled2),
    ])
    final = distilled2.parent / "pruned_hubert_base.pth"
    assert final.exists()

    # downstream load + inference (the public consumption contract)
    _run_cli(load_dpmodel, [str(final)])

    # and the final model must be smaller than the teacher
    tk = load_checkpoint(teacher_ckpt)
    n_teacher = sum(int(np.prod(v.shape)) for v in tk["state_dict"].values())
    n_final = sum(int(np.prod(v.shape)) for v in load_checkpoint(final)["state_dict"].values())
    assert n_final < n_teacher
