"""Measure zero-shot scoring throughput across the model ladder.

Same workload shape as bench.py (masked 512bp windows, batch 128) for each
preset given on the command line; prints one JSON line per model. Reference
GPU numbers for context are in BASELINE.md (l20 H100 312.5 win/s, A100 263).

Usage: python tools/ladder.py [l20 l24 l28 l32 ...] [--windows 2000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(model: str, n_windows: int, batch: int) -> float:
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
    from plantcaduceus_tpu.models.config import CaduceusConfig
    from plantcaduceus_tpu.utils.model_loading import init_params_host

    window = 8192 if model.startswith("pc2") else 512
    if model.startswith("pc2"):
        batch = min(batch, 16)  # 8192-bp windows: keep activations in HBM
    cfg = CaduceusConfig.preset(model)
    params = init_params_host(cfg)
    tok = DnaTokenizer()
    runner = InferenceRunner(params, cfg, dtype=jnp.bfloat16, batch_size=batch)

    rng = np.random.default_rng(0)
    ids = rng.integers(7, 11, size=(n_windows, window)).astype(np.int32)
    pos = window // 2 - 1
    ids[:, pos] = tok.mask_token_id
    nuc = [7, 8, 9, 10]

    runner.masked_probs(ids[:batch], nuc, pos, progress=False)  # compile
    t0 = time.time()
    probs = runner.masked_probs(ids, nuc, pos, progress=False)
    dt = time.time() - t0
    assert probs.shape == (n_windows, 4) and np.isfinite(probs).all()
    return n_windows / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=["l20", "l24", "l28", "l32"])
    ap.add_argument("--windows", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    for m in args.models or ["l20", "l24", "l28", "l32"]:
        wps = measure(m, args.windows, args.batch)
        print(json.dumps({"model": m, "windows_per_s": round(wps, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
