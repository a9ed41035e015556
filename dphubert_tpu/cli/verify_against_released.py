"""North-star parity check against a released DPHuBERT/DPWavLM checkpoint.

Loads a released compressed checkpoint (e.g. ``DPHuBERT-sp0.75.pth`` from
https://huggingface.co/pyf98/DPHuBERT, reference ``README.md:92-112``) into
BOTH this framework and the torch reference implementation, runs both on the
same audio, and asserts per-layer hidden-state agreement.

Usage::

    python -m dphubert_tpu.cli.verify_against_released \
        --ckpt /path/to/DPHuBERT-sp0.75.pth \
        [--audio /path/to/clip.wav] [--reference_dir /root/reference] \
        [--atol 1e-4] [--expect_params 23585946]

Without ``--audio`` a deterministic synthetic clip is used (parity holds for
any input; real LibriSpeech audio additionally exercises the decoder).  Runs
on CPU: parity belongs on a backend with true fp32 matmuls.

Exit code 0 = all layers within tolerance; nonzero otherwise.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def cli_main(argv=None):
    parser = argparse.ArgumentParser(
        description="Verify a released compressed checkpoint against the "
        "torch reference implementation layer by layer."
    )
    parser.add_argument("--ckpt", required=True, help="released .pth checkpoint")
    parser.add_argument("--audio", default=None, help="wav/flac clip (synthetic if omitted)")
    parser.add_argument("--reference_dir", default="/root/reference")
    parser.add_argument("--atol", type=float, default=1e-4)
    parser.add_argument("--rtol", type=float, default=1e-4)
    parser.add_argument(
        "--expect_params", type=int, default=None,
        help="assert total parameter count (README: DPHuBERT-sp0.75 = "
        "23585946, DPWavLM-sp0.75 = 23586325)",
    )
    parser.add_argument("--seconds", type=float, default=2.0)
    args = parser.parse_args(argv)

    import jax

    # Force CPU BEFORE any device/backend query: jax.default_backend() would
    # initialize the env-pinned backend (the shared TPU chip via the relay
    # tunnel), after which switching platforms throws or is ignored — and the
    # <=1e-4 check would run on bf16-ish TPU matmuls and spuriously fail.
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        # a backend is already live (e.g. under pytest with conftest's CPU
        # switch, or an embedding process); verify it is actually CPU
        if jax.default_backend() != "cpu":
            print("FAIL: a non-CPU jax backend is already initialized; "
                  "run this tool in a fresh process")
            return 2

    from ..interop.torch_ckpt import load_checkpoint, load_model
    from ..params import num_leaves_numel

    model, params = load_model(args.ckpt)
    n_params = num_leaves_numel(params)
    print(f"native load: {n_params:,} parameters")
    if args.expect_params is not None and n_params != args.expect_params:
        print(f"FAIL: expected {args.expect_params:,} parameters")
        return 1

    if args.audio is not None:
        from ..data.audio import load_audio

        wave, sr = load_audio(args.audio)
        wave = np.asarray(wave, np.float32).reshape(1, -1)
        print(f"audio: {args.audio} ({wave.shape[1]} samples @ {sr} Hz)")
    else:
        n = int(args.seconds * 16000)
        wave = (
            np.random.default_rng(0).standard_normal((1, n)).astype(np.float32)
            * 0.1
        )
        print(f"audio: synthetic {n} samples")

    outs, _ = model.extract_features(params, wave)
    outs = [np.asarray(o, np.float32) for o in outs]

    # torch reference side
    sys.path.insert(0, args.reference_dir)
    try:
        import torch
        from wav2vec2.model import wav2vec2_model as torch_wav2vec2_model

        ckpt = load_checkpoint(args.ckpt)
        tmodel = torch_wav2vec2_model(**ckpt["config"])
        result = tmodel.load_state_dict(
            {k: torch.tensor(v) for k, v in ckpt["state_dict"].items()},
            strict=False,
        )
        if result.unexpected_keys:
            print(f"FAIL: unexpected keys in reference load: {result.unexpected_keys}")
            return 1
        tmodel.eval()
        with torch.no_grad():
            touts, _ = tmodel.extract_features(torch.tensor(wave))
        touts = [t.numpy() for t in touts]
    finally:
        sys.path.remove(args.reference_dir)

    if len(outs) != len(touts):
        print(f"FAIL: layer count {len(outs)} != reference {len(touts)}")
        return 1

    status = 0
    for i, (a, b) in enumerate(zip(outs, touts)):
        err = np.abs(a - b).max()
        ok = np.allclose(a, b, atol=args.atol, rtol=args.rtol)
        print(f"layer {i:2d}: max|diff| = {err:.3e}  {'ok' if ok else 'FAIL'}")
        status |= 0 if ok else 1
    print("PASS" if status == 0 else "FAIL")
    return status


if __name__ == "__main__":
    raise SystemExit(cli_main())
