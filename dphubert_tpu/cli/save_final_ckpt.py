"""Stage 3: merge stage-2 weights with the stage-1.5 pruned config
(reference ``save_final_ckpt.py``)."""

from __future__ import annotations

import json
import pathlib
from argparse import ArgumentParser

from .common import force_cpu_for_host_stage
from ..interop.torch_ckpt import load_checkpoint, save_checkpoint
from .prune import load_pruned_model


def parse_args():
    parser = ArgumentParser(
        description="Merge final-distill weights with the pruned config "
        "into a portable checkpoint."
    )
    parser.add_argument("--config_path", type=pathlib.Path, required=True,
                        help="Checkpoint containing the pruned config.")
    parser.add_argument("--ckpt_after_final_distill", type=pathlib.Path,
                        required=True)
    parser.add_argument("--out", type=pathlib.Path, default=None)
    return parser.parse_args()


def cli_main():
    force_cpu_for_host_stage()
    args = parse_args()
    config = load_checkpoint(args.config_path)["config"]
    print(json.dumps(config, indent=4))

    ckpt = load_checkpoint(args.ckpt_after_final_distill)
    state_dict = ckpt["state_dict"]
    if any(k.startswith("student_model.") for k in state_dict):
        state_dict = {
            k[len("student_model."):]: v
            for k, v in state_dict.items()
            if k.startswith("student_model.")
        }
    out_path = args.out or (
        args.ckpt_after_final_distill.parent / "pruned_hubert_base.pth"
    )
    save_checkpoint(
        out_path, config, state_dict, ckpt.get("distill_linear_projs", {})
    )
    load_pruned_model(out_path)  # strict reload verify
    print(f"Wrote pruned model checkpoint (weights + config): {out_path}")


if __name__ == "__main__":
    cli_main()
