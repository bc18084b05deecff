"""A/B the Qwen3-4B decode step across serving modes on one chip.

Isolates the round-2 regression (int8 decode 406.7 tok/s vs bf16 462.3,
BENCH_r02) by measuring the marginal FusedDecode step cost for:

  1. bf16 weights + bf16 KV        (the 17.3 ms/step baseline)
  2. w8a8 weights + bf16 KV        (weight-quant contribution alone)
  3. w8a8 weights + int8 KV        (the full int8 serving mode)

Component-level entitlement comes from tools/diagnose_int8_decode.py;
this script attributes the e2e gap.

Usage: python tools/ab_int8_decode.py [--modes bf16,w8a8,w8a8c8]
"""

from __future__ import annotations

import argparse
import dataclasses
import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, REPO)
import bench  # noqa: E402  (qwen3_4b_config, _decode_per_step_s)


def build(mode: str):
    from mojo_opset_tpu.modeling.qwen3 import Qwen3ForCausalLM, quantize_qwen3
    from mojo_opset_tpu.utils.init import build_on_device, device_init_scope

    cfg = bench.qwen3_4b_config()
    if mode == "w8a8c8":
        cfg = dataclasses.replace(cfg, quant_kv=True)
    base = build_on_device(Qwen3ForCausalLM, cfg, key=jax.random.PRNGKey(0))
    if mode == "bf16":
        return base, cfg

    def qmake(m):
        with device_init_scope():
            return quantize_qwen3(m)

    model = jax.jit(qmake, donate_argnums=0)(base)
    del base
    return model, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="bf16,w8a8,w8a8c8")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    for mode in args.modes.split(","):
        t0 = time.perf_counter()
        model, cfg = build(mode)
        jax.block_until_ready(jax.tree_util.tree_leaves(model)[0])
        t_build = time.perf_counter() - t0
        per_step, kv_dtype = bench._decode_per_step_s(model, cfg, 8, 4000)
        print(
            f"{mode:7s} ms/step={per_step * 1e3:7.2f} tok/s={8 / per_step:7.1f} "
            f"kv={kv_dtype} (build {t_build:.0f}s)",
            flush=True,
        )
        del model
        gc.collect()


if __name__ == "__main__":
    main()
