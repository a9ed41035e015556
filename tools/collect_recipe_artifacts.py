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

    # a preempted/resumed stage logs its start line more than once — keep
    # every occurrence so the total wall clock spans all segments
    stamps: dict = {}
    for line in open(args.log, errors="replace"):
        m = re.match(r"\[run\.sh\] (\S+) (stage [\d.]+|done)", line)
        if m:
            stamps.setdefault(m.group(2), []).append(m.group(1))
    (args.out / "stage_timestamps.json").write_text(json.dumps(stamps, indent=1))

    summary = {"stage_timestamps": stamps}
    if "stage 1" in stamps and "done" in stamps:
        from datetime import datetime

        t0 = datetime.fromisoformat(stamps["stage 1"][0])
        t1 = datetime.fromisoformat(stamps["done"][-1])
        summary["wall_clock_h"] = round((t1 - t0).total_seconds() / 3600, 3)

    for stage in ("stage1", "stage2"):
        src = args.exp / stage / "metrics.jsonl"
        if not src.exists():
            continue
        rows = downsample_metrics(src, args.out / f"{stage}_metrics.jsonl")
        last = rows[-1]
        # metrics.jsonl appends across preemption restarts and "elapsed"
        # resets with each process: accumulate stepping time per segment
        total_el = total_st = 0.0
        prev = None
        for r in rows:
            if prev is not None and r["elapsed"] >= prev["elapsed"]:
                total_el += r["elapsed"] - prev["elapsed"]
                total_st += r["step"] - prev["step"]
            prev = r
        summary[stage] = {
            "steps": last["step"],
            "stepping_h": round(total_el / 3600, 3),
            "sustained_s_per_step": (
                round(total_el / total_st, 4) if total_st else None
            ),
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
