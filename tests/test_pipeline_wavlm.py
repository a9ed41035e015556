"""WavLM variant of the pipeline: stage-1 distill -> prune (remaining_heads
branch) -> reload, through the CLI entry points."""

import numpy as np
import pytest

from dphubert_tpu.interop.torch_ckpt import load_checkpoint, save_checkpoint
from dphubert_tpu.params import flatten_params

from tests.test_forward_parity import _tiny_wavlm_config
from tests.test_pipeline_e2e import _run_cli, synth_data  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def wavlm_teacher_ckpt(tmp_path_factory):
    import jax

    from dphubert_tpu import wav2vec2_model

    path = tmp_path_factory.mktemp("pretrained") / "wavlm_teacher.pth"
    cfg = _tiny_wavlm_config()
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))
    save_checkpoint(path, cfg, flatten_params(jax.tree.map(np.asarray, params)))
    return path


def test_wavlm_pipeline(synth_data, wavlm_teacher_ckpt, tmp_path):
    from dphubert_tpu.cli import distill, load_dpmodel, prepare_data, prune

    tsv_dir = tmp_path / "tsv"
    exp1 = tmp_path / "stage1"
    _run_cli(prepare_data, ["--data", str(synth_data), "--out", str(tsv_dir),
                            "--extension", "wav"])

    _run_cli(distill, [
        "--tsv_dir", str(tsv_dir), "--train_subset", "train100",
        "--seconds_per_batch", "20", "--num_workers", "2",
        "--num_shapes", "4", "--num_data_shards", "1",
        "--precision", "fp32",
        "--teacher_ckpt", str(wavlm_teacher_ckpt),
        "--student_ckpt", str(wavlm_teacher_ckpt),
        "--exp_dir", str(exp1),
        "--max_updates", "2", "--warmup_updates", "1",
        "--sparsity_warmup_updates", "1", "--target_sparsity", "0.5",
        "--distill_layers", "0.1,3", "--log_interval", "1",
        "--pruning_units", "conv,head,interm,attlayer,ffnlayer",
    ])
    distilled = exp1 / "ckpts" / "distilled.pth"
    assert distilled.exists()

    _run_cli(prune, ["--distilled_ckpt", str(distilled)])
    pruned = distilled.parent / "pruned_hubert_base.pth"
    ck = load_checkpoint(pruned)
    # WavLM branch: surgery emits remaining_heads index lists
    assert "encoder_remaining_heads" in ck["config"]
    assert all(
        isinstance(h, list) for h in ck["config"]["encoder_remaining_heads"]
    )
    _run_cli(load_dpmodel, [str(pruned)])

    # stage 2: final distill of the heterogeneous WavLM student (the
    # remaining_heads training path — irregular per-layer head counts
    # through the gated rel-pos attention and its backward)
    from dphubert_tpu.cli import final_distill, save_final_ckpt

    exp2 = tmp_path / "stage2"
    _run_cli(final_distill, [
        "--tsv_dir", str(tsv_dir), "--train_subset", "train100",
        "--seconds_per_batch", "20", "--num_workers", "2",
        "--num_shapes", "4", "--num_data_shards", "1",
        "--precision", "fp32",
        "--teacher_ckpt", str(wavlm_teacher_ckpt),
        "--student_ckpt", str(pruned),
        "--exp_dir", str(exp2),
        "--max_updates", "2", "--warmup_updates", "1",
        "--distill_layers", "0.1,3", "--log_interval", "1",
    ])
    distilled2 = exp2 / "ckpts" / "distilled.pth"
    assert distilled2.exists()

    # stage 3: merge + export + reload (full run.sh surface for WavLM)
    _run_cli(save_final_ckpt, [
        "--config_path", str(pruned),
        "--ckpt_after_final_distill", str(distilled2),
    ])
    final = distilled2.parent / "pruned_hubert_base.pth"
    assert final.exists()
    _run_cli(load_dpmodel, [str(final)])
