"""Stage 2: final distillation of the pruned student (reference
``final_distill.py``): same trainer with ``use_reg=False`` — no gates, no
Lagrangian — and projections warm-started from stage 1."""

from __future__ import annotations

from argparse import ArgumentParser

from .distill import add_common_training_args, run_train


def _parse_args():
    parser = ArgumentParser(description="Final distillation (stage 2)")
    add_common_training_args(parser)
    return parser.parse_args()


def cli_main():
    args = _parse_args()
    run_train(args, use_reg=False)


if __name__ == "__main__":
    cli_main()
