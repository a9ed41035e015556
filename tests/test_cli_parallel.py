"""CLI-driven tensor-parallel / FSDP coverage on the virtual 8-device CPU
mesh.  The library-level layouts are covered in test_multidevice; this
drives ``cli.distill`` itself so the flag plumbing (``--tensor_parallel``,
``--fsdp``, ``--num_data_shards`` -> ``create_mesh``) is exercised
end-to-end, including the too-few-devices error path."""

import json

import numpy as np
import pytest

from tests.test_forward_parity import _tiny_w2v2_config
from tests.test_pipeline_e2e import _run_cli, _write_wav


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    import jax

    from dphubert_tpu import wav2vec2_model
    from dphubert_tpu.cli import prepare_data
    from dphubert_tpu.interop.torch_ckpt import save_checkpoint
    from dphubert_tpu.params import flatten_params

    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    (root / "train-clean-100" / "1" / "2").mkdir(parents=True)
    (root / "dev-clean" / "3" / "4").mkdir(parents=True)
    # enough clips to fill one global batch at num_data_shards=2 (rung
    # 32000, 10 clips/replica x 2 replicas)
    for i in range(24):
        n = int(rng.integers(40_000, 60_000))
        _write_wav(root / "train-clean-100" / "1" / "2" / f"u{i:03d}.wav",
                   0.1 * rng.standard_normal(n))
    for i in range(4):
        n = int(rng.integers(40_000, 60_000))
        _write_wav(root / "dev-clean" / "3" / "4" / f"d{i:03d}.wav",
                   0.1 * rng.standard_normal(n))
    tsv = tmp_path_factory.mktemp("tsv")
    _run_cli(prepare_data, ["--data", str(root), "--out", str(tsv),
                            "--extension", "wav"])

    cfg = _tiny_w2v2_config()  # inner dims 64/128: divisible by model=2
    model = wav2vec2_model(**cfg)
    params = model.init(jax.random.key(0))
    ck = tmp_path_factory.mktemp("pretrained") / "teacher.pth"
    save_checkpoint(ck, cfg, flatten_params(jax.tree.map(np.asarray, params)))
    return tsv, ck


def _distill_args(synth_env, exp_dir, extra):
    tsv, ck = synth_env
    return [
        "--tsv_dir", str(tsv), "--train_subset", "train100",
        "--seconds_per_batch", "20", "--num_workers", "0",
        "--num_shapes", "2", "--precision", "fp32",
        "--teacher_ckpt", str(ck), "--student_ckpt", str(ck),
        "--log_interval", "1", "--warmup_updates", "1", "--max_updates", "2",
        "--sparsity_warmup_updates", "1", "--target_sparsity", "0.2",
        "--pruning_units", "head,interm", "--distill_layers", "0.1,3",
        "--exp_dir", str(exp_dir),
    ] + extra


@pytest.mark.slow
def test_cli_distill_tp_plus_fsdp(synth_env, tmp_path):
    """--tensor_parallel 2 --fsdp --num_data_shards 4 on the 8-device CPU
    mesh (HSDP layouts) must train to a finite-loss exported checkpoint."""
    from dphubert_tpu.cli import distill
    from dphubert_tpu.interop.torch_ckpt import load_checkpoint

    exp = tmp_path / "tp_fsdp"
    _run_cli(distill, _distill_args(synth_env, exp, [
        "--tensor_parallel", "2", "--fsdp", "--num_data_shards", "2",
    ]))
    ck = load_checkpoint(exp / "ckpts" / "distilled.pth")
    for k, v in ck["state_dict"].items():
        assert np.isfinite(v).all(), k
    rows = [json.loads(l) for l in open(exp / "metrics.jsonl")]
    assert rows and np.isfinite(rows[-1]["loss"])


def test_cli_tensor_parallel_exceeding_devices_fails_loudly(synth_env, tmp_path):
    """tensor_parallel > visible devices used to divide to n_data=0 and die
    in mesh construction; now it's an explicit error."""
    from dphubert_tpu.cli import distill

    with pytest.raises(SystemExit) as ei:
        _run_cli(distill, _distill_args(synth_env, tmp_path / "x", [
            "--tensor_parallel", "16",
        ]))
    assert "devices" in str(ei.value)
