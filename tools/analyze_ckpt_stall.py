"""Measure the checkpoint stall from a training run's metrics.jsonl.

The trainer logs one row per ``log_interval`` steps with a cumulative
``elapsed``; a checkpoint at step m (every ``ckpt_interval``) stalls the
row whose (prev_step, step] window contains m.  This splits rows into
checkpoint-crossing and clean, and reports the medians plus the implied
stall per checkpoint — the r4 evidence was npz ~50 s / orbax ~21-30 s per
1000-step checkpoint (655 ms/step across the crossing window vs 154
clean); the r5 BackgroundSaver target is < 5 s (VERDICT r4 next #1).

Usage::

    python tools/analyze_ckpt_stall.py _run_data/exp_full_r5/stage1/metrics.jsonl \
        [--ckpt_interval 1000] [--dispatch 4]

Prints one JSON object.  Resume discontinuities (elapsed resets to a
smaller value after a preemption) are skipped, not misread as negative
step times.
"""

from __future__ import annotations

import argparse
import json
import pathlib


def analyze(path: pathlib.Path, ckpt_interval: int, dispatch: int) -> dict:
    rows = [json.loads(l) for l in open(path) if l.strip()]
    crossing, clean, skipped = [], [], 0
    ckpt_marks: set = set()
    for prev, cur in zip(rows, rows[1:]):
        dstep = cur["step"] - prev["step"]
        dt = cur["elapsed"] - prev["elapsed"]
        if dstep <= 0 or dt <= 0:  # resume restart: elapsed resets
            skipped += 1
            continue
        # a checkpoint fires when the step counter crosses a multiple of
        # ckpt_interval; with steps_per_dispatch=K the fire lands within
        # K-1 steps after the exact multiple — the fire window [m, m+K-1]
        # can straddle two log rows, so flag every row it touches but
        # count each checkpoint (distinct m) once
        lo, hi = prev["step"], cur["step"]
        marks = {
            m
            for m in range(
                (lo // ckpt_interval) * ckpt_interval,
                hi + 1,
                ckpt_interval,
            )
            if m > 0 and any(lo < m + off <= hi for off in range(dispatch))
        }
        ckpt_marks |= marks
        (crossing if marks else clean).append((s := dt / dstep, dstep))
    med = lambda xs: sorted(xs)[len(xs) // 2] if xs else None
    clean_med = med([s for s, _ in clean])
    cross_med = med([s for s, _ in crossing])
    all_s = [s for s, _ in clean] + [s for s, _ in crossing]
    out = {
        "rows": len(rows),
        "skipped_resume_rows": skipped,
        "n_ckpts": len(ckpt_marks),
        "clean_median_s_per_step": round(clean_med, 4) if clean_med else None,
        "crossing_median_s_per_step": round(cross_med, 4) if cross_med else None,
        "sustained_s_per_step": round(med(all_s), 4) if all_s else None,
        # the VERDICT criterion metric: total wall over total steps
        # (means, so checkpoint stalls weigh in; restarts excluded)
        "wall_s_per_step": round(
            sum(s * d for s, d in clean + crossing)
            / sum(d for _, d in clean + crossing), 4
        ) if (clean or crossing) else None,
    }
    if clean_med and crossing and ckpt_marks:
        # total time above the clean rate across all crossing rows,
        # attributed evenly to the checkpoints they contain
        excess = sum((s - clean_med) * d for s, d in crossing)
        out["est_stall_s_per_ckpt"] = round(excess / len(ckpt_marks), 2)
        out["sustained_over_clean"] = round(
            out["sustained_s_per_step"] / clean_med, 3
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics", type=pathlib.Path)
    ap.add_argument("--ckpt_interval", type=int, default=1000)
    ap.add_argument("--dispatch", type=int, default=4,
                    help="steps_per_dispatch of the run (fire-window slack)")
    args = ap.parse_args()
    print(json.dumps(analyze(args.metrics, args.ckpt_interval, args.dispatch)))


if __name__ == "__main__":
    main()
