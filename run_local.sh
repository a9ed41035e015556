#!/bin/bash
# Single-host convenience wrapper (reference run_local.sh): identical recipe
# to run.sh — on TPU there is no SLURM layer to strip, so this is an alias.
exec bash "$(dirname "$0")/run.sh" "$@"
