"""Convert HuggingFace checkpoints to the portable format (reference
``convert_hubert_from_hf.py`` / ``convert_wavlm_from_hf.py``).

Accepts a local model directory (this environment has no network egress) or
a hub id where egress exists::

    python -m dphubert_tpu.cli.convert_from_hf \
        --model facebook/hubert-base-ls960 --type hubert \
        --out pretrained/hubert-base-ls960.hf.pth
"""

from __future__ import annotations

import pathlib
from argparse import ArgumentParser

import jax
import numpy as np

from ..interop.hf import import_huggingface_model
from ..interop.torch_ckpt import save_checkpoint, verify_strict
from ..params import flatten_params


def cli_main():
    parser = ArgumentParser(description="Convert a HuggingFace model.")
    parser.add_argument("--model", required=True,
                        help="Local path or hub id of the HF model.")
    parser.add_argument("--type", default="hubert",
                        choices=["hubert", "wav2vec2", "wavlm"])
    parser.add_argument("--out", type=pathlib.Path, required=True)
    args = parser.parse_args()

    from transformers import HubertModel, Wav2Vec2Model, WavLMModel

    cls = {"hubert": HubertModel, "wav2vec2": Wav2Vec2Model, "wavlm": WavLMModel}[
        args.type
    ]
    original = cls.from_pretrained(args.model)
    model, params = import_huggingface_model(original)

    sd = flatten_params(jax.tree.map(np.asarray, params))
    verify_strict(model, sd)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    save_checkpoint(args.out, model.config, sd)
    print(f"Saved converted checkpoint to {args.out}")


if __name__ == "__main__":
    cli_main()
