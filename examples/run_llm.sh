#!/bin/bash
# LLM inference launcher (reference examples/run_llm.sh — there it pulls
# Qwen/Qwen3-8B from modelscope and targets an Ascend NPU; here any local
# HF Qwen3 checkpoint runs on TPU via JAX, falling back to the tiny
# random-weight self-test when no checkpoint is given).
set -euo pipefail

SCRIPT_DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && pwd )"
PROJECT_ROOT="$(dirname "$SCRIPT_DIR")"
MODEL_PATH="${1:-}"

cd "$PROJECT_ROOT"
if [ -n "$MODEL_PATH" ] && [ -d "$MODEL_PATH" ]; then
    echo "Running inference with model at: ${MODEL_PATH}"
    python3 examples/llm_inference.py --checkpoint "$MODEL_PATH" --max-new-tokens 100
else
    echo "No checkpoint given — running the tiny random-weight self-test"
    python3 examples/llm_inference.py --tiny --max-new-tokens 32
fi
