#!/bin/bash
# Wan2.2 DiT inference launcher (reference examples/run_dit.sh — there it
# clones Wan2.2 and pulls Wan-AI/Wan2.2-TI2V-5B; here a local checkpoint
# directory is optional and the structural self-test runs without one).
set -euo pipefail

SCRIPT_DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && pwd )"
PROJECT_ROOT="$(dirname "$SCRIPT_DIR")"
CKPT_DIR="${1:-}"

cd "$PROJECT_ROOT"
if [ -n "$CKPT_DIR" ] && [ -d "$CKPT_DIR" ]; then
    echo "Running DiT inference with checkpoint at: ${CKPT_DIR}"
    python3 examples/dit_inference.py --ckpt-dir "$CKPT_DIR"
else
    echo "No checkpoint given — running the structural self-test"
    python3 examples/dit_inference.py --steps 4 --dim 128 --layers 2
fi
