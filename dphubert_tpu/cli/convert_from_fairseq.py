"""Convert fairseq wav2vec2/HuBERT checkpoints to the portable format
(reference ``convert_*_from_fairseq.py``, 6 scripts -> one CLI).

Operates at the state-dict level (no fairseq import needed when the
checkpoint's ``model`` entry contains plain tensors)::

    python -m dphubert_tpu.cli.convert_from_fairseq \
        --ckpt hubert_base_ls960.pt --arch hubert_base \
        --out pretrained/hubert-base-ls960.fairseq.pth
"""

from __future__ import annotations

import pathlib
from argparse import ArgumentParser

import jax
import numpy as np

from ..interop.hf import rename_fairseq_state_dict
from ..interop.torch_ckpt import save_checkpoint
from ..models import model as model_factories
from ..params import flatten_params, init_params

ARCHES = {
    # arch -> (factory, normalize_waveform)  — Large family uses layer_norm
    # extractor + per-utterance waveform LN
    # (convert_hubert_large_from_fairseq.py:40)
    "wav2vec2_base": "wav2vec2_base",
    "wav2vec2_large": "wav2vec2_large",
    "wav2vec2_large_lv60k": "wav2vec2_large_lv60k",
    "hubert_base": "hubert_base",
    "hubert_large": "hubert_large",
    "hubert_xlarge": "hubert_xlarge",
}


def convert(ckpt_path, arch: str):
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw.get("state_dict", raw))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    sd = rename_fairseq_state_dict(sd)

    model = getattr(model_factories, ARCHES[arch])()
    template = flatten_params(init_params(model.spec, jax.random.key(0)))
    missing = sorted(k for k in template if k not in sd)
    unexpected = sorted(k for k in sd if k not in template)
    for k in missing:
        sd[k] = np.asarray(template[k])
    for k in unexpected:
        del sd[k]
    print(f"Missing (fresh init): {missing}\nUnexpected (dropped): {unexpected}")
    return model, sd


def cli_main():
    parser = ArgumentParser(description="Convert a fairseq checkpoint.")
    parser.add_argument("--ckpt", type=pathlib.Path, required=True)
    parser.add_argument("--arch", choices=sorted(ARCHES), required=True)
    parser.add_argument("--out", type=pathlib.Path, required=True)
    args = parser.parse_args()
    model, sd = convert(args.ckpt, args.arch)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    save_checkpoint(args.out, model.config, sd)
    print(f"Saved converted checkpoint to {args.out}")


if __name__ == "__main__":
    cli_main()
