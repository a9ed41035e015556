"""Collect the committed evidence bundle from a full-recipe run.

Reads the run.sh experiment directory produced by a full 4-stage run and
writes a compact artifact set under docs/<name>/: stage metrics
(downsampled), the run log's stage timestamps, the pruned config, and a
summary JSON with wall-clock, throughput, controller endpoint, and final
parameter counts.

Usage::

    python tools/collect_recipe_artifacts.py \
        --exp /root/repo/_run_data/exp_full \
        --log /root/repo/_run_data/full_run.log \
        --out docs/full_recipe_r3
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def downsample_metrics(src: pathlib.Path, dst: pathlib.Path, every: int = 10):
    rows = [json.loads(l) for l in open(src)]
    keep = [r for i, r in enumerate(rows) if i % every == 0 or i == len(rows) - 1]
    with open(dst, "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", type=pathlib.Path, required=True)
    ap.add_argument("--log", type=pathlib.Path, required=True)
    ap.add_argument("--out", type=pathlib.Path, required=True)
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    stamps = {}
    for line in open(args.log, errors="replace"):
        m = re.match(r"\[run\.sh\] (\S+) (stage [\d.]+|done)", line)
        if m:
            stamps[m.group(2)] = m.group(1)
    (args.out / "stage_timestamps.json").write_text(json.dumps(stamps, indent=1))

    summary = {"stage_timestamps": stamps}
    for stage in ("stage1", "stage2"):
        src = args.exp / stage / "metrics.jsonl"
        if not src.exists():
            continue
        rows = downsample_metrics(src, args.out / f"{stage}_metrics.jsonl")
        last = rows[-1]
        n = len(rows)
        mid = rows[n // 4]  # skip startup for the sustained rate
        el = last["elapsed"] - mid["elapsed"]
        st = last["step"] - mid["step"]
        summary[stage] = {
            "steps": last["step"],
            "elapsed_h": round(last["elapsed"] / 3600, 3),
            "sustained_s_per_step": round(el / st, 4) if st else None,
            "final": {k: last[k] for k in
                      ("loss", "loss_distill", "loss_cos", "loss_l1")
                      if k in last},
        }
        if "sparsity_expected" in last:
            summary[stage]["final_sparsity"] = last["sparsity_expected"]

    # pruned model config + param counts from the exported checkpoints
    try:
        import numpy as np

        from dphubert_tpu.interop.torch_ckpt import load_checkpoint

        for name, path in (
            ("pruned", args.exp / "stage1" / "ckpts" / "pruned_hubert_base.pth"),
            ("final", args.exp / "dphubert.pth"),
        ):
            if path.exists():
                ck = load_checkpoint(path)
                n_params = int(sum(int(np.prod(v.shape))
                                   for v in ck["state_dict"].values()))
                summary[f"{name}_params"] = n_params
                if name == "final":
                    (args.out / "final_config.json").write_text(
                        json.dumps(ck["config"], indent=1, default=str))
    except Exception as e:  # keep collection usable mid-run
        summary["ckpt_note"] = str(e)

    (args.out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
