"""Generate a synthetic (randomly initialized) full-size teacher checkpoint.

The TPU environment has no egress, so full-recipe wall-clock/convergence
demonstrations use randomly initialized teachers of the exact published
architectures instead of the released pretrained weights (reference
``README.md:71-80`` downloads them from HF/fairseq).  The checkpoint is
saved in the reference-portable ``{"config", "state_dict"}`` format
(reference ``convert_hubert_from_hf.py:18-52``), so run.sh / run_large.sh
consume it exactly like a real converted teacher.

Usage::

    python tools/make_synth_teacher.py --preset hubert_base \
        --out _run_data/pretrained/hubert-base-synth.pth
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from dphubert_tpu.models import model as model_lib  # noqa: E402
from dphubert_tpu.interop.torch_ckpt import save_checkpoint  # noqa: E402
from dphubert_tpu.params import flatten_params  # noqa: E402

PRESETS = (
    "wav2vec2_base", "wav2vec2_large", "wav2vec2_large_lv60k",
    "hubert_base", "hubert_large", "hubert_xlarge",
    "wavlm_base", "wavlm_large",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=PRESETS, required=True)
    ap.add_argument("--out", type=pathlib.Path, required=True)
    ap.add_argument("--seed", type=int, default=2022)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    model = getattr(model_lib, args.preset)()
    params = model.init(jax.random.key(args.seed))
    state_dict = flatten_params(jax.tree.map(np.asarray, params))
    n = sum(int(np.prod(v.shape)) for v in state_dict.values())
    args.out.parent.mkdir(parents=True, exist_ok=True)
    save_checkpoint(args.out, model.config, state_dict)
    print(f"{args.preset}: {n:,} params -> {args.out}")


if __name__ == "__main__":
    main()
