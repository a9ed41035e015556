"""Smoke-load a compressed checkpoint (reference ``load_dpmodel.py``)."""

from __future__ import annotations

import sys

import numpy as np

from .common import force_cpu_for_host_stage
from ..interop.torch_ckpt import load_model
from ..params import num_leaves_numel


def cli_main():
    force_cpu_for_host_stage()
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        print("usage: python -m dphubert_tpu.cli.load_dpmodel [ckpt.pth]")
        return
    path = sys.argv[1] if len(sys.argv) > 1 else "pruned_hubert_base.pth"
    model, params = load_model(path)
    n = num_leaves_numel(params)
    print(f"Loaded {path}: {n:,} parameters")
    wave = np.zeros((1, 16000), np.float32)
    outs, _ = model.extract_features(params, wave)
    print(f"extract_features: {len(outs)} layers, last {np.asarray(outs[-1]).shape}")


if __name__ == "__main__":
    cli_main()
