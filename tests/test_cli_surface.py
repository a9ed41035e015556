"""CLI surface guards: --help exits cleanly for every entry point, and the
fairseq converter round-trips a synthetic checkpoint."""

import sys

import numpy as np
import pytest


@pytest.mark.parametrize(
    "mod",
    ["distill", "final_distill", "prune", "save_final_ckpt", "prepare_data",
     "convert_from_hf", "convert_from_fairseq"],
)
def test_cli_help(mod):
    import importlib

    m = importlib.import_module(f"dphubert_tpu.cli.{mod}")
    old = sys.argv
    sys.argv = ["prog", "--help"]
    try:
        with pytest.raises(SystemExit) as e:
            m.cli_main()
        assert e.value.code == 0
    finally:
        sys.argv = old


def test_convert_from_fairseq_cli(tmp_path):
    torch = pytest.importorskip("torch")
    import jax

    from dphubert_tpu.cli.convert_from_fairseq import cli_main
    from dphubert_tpu.interop.torch_ckpt import load_checkpoint
    from dphubert_tpu.models.model import hubert_base
    from dphubert_tpu.params import flatten_params, init_params

    # synthesize a fairseq-layout checkpoint from a real param tree
    model = hubert_base()
    flat = flatten_params(init_params(model.spec, jax.random.key(0)))
    fsd = {}
    for k, v in flat.items():
        fk = k
        fk = fk.replace("encoder.feature_projection.projection.", "post_extract_proj.")
        fk = fk.replace("encoder.feature_projection.layer_norm.", "layer_norm.")
        fk = fk.replace("encoder.transformer.pos_conv_embed.conv.", "encoder.pos_conv.0.")
        fk = fk.replace("encoder.transformer.layer_norm.", "encoder.layer_norm.")
        fk = fk.replace("encoder.transformer.layers.", "encoder.layers.")
        fk = fk.replace(".attention.", ".self_attn.")
        fk = fk.replace(".layer_norm.", ".self_attn_layer_norm.") if ".layers." in fk and ".feed_forward." not in fk and "self_attn_layer_norm" not in fk and "final" not in fk and "conv_layers" not in fk else fk
        fk = fk.replace(".feed_forward.intermediate_dense.", ".fc1.")
        fk = fk.replace(".feed_forward.output_dense.", ".fc2.")
        if fk.startswith("feature_extractor.conv_layers."):
            parts = fk.split(".")
            if parts[3] == "conv":
                fk = f"feature_extractor.conv_layers.{parts[2]}.0.{parts[4]}"
            elif parts[3] == "layer_norm":
                fk = f"feature_extractor.conv_layers.{parts[2]}.2.1.{parts[4]}"
        if fk == "feature_extractor.dummy_weight":
            continue  # ours-only tensor
        fsd[fk] = torch.from_numpy(np.asarray(v))
    src = tmp_path / "fairseq.pt"
    torch.save({"model": fsd}, src)

    out = tmp_path / "converted.pth"
    old = sys.argv
    sys.argv = ["prog", "--ckpt", str(src), "--arch", "hubert_base",
                "--out", str(out)]
    try:
        cli_main()
    finally:
        sys.argv = old
    ck = load_checkpoint(out)
    # every weight except the ours-only dummy survived the rename chain
    assert set(ck["state_dict"].keys()) == set(flat.keys())
    np.testing.assert_array_equal(
        ck["state_dict"]["encoder.transformer.layers.3.attention.k_proj.weight"],
        np.asarray(flat["encoder.transformer.layers.3.attention.k_proj.weight"]),
    )
