"""Round benchmark: zero-shot scoring throughput across the model ladder.

Mirrors the reference's headline benchmark — wall-clock to zero-shot score
masked 512-bp windows (reference README.md:331-385, 5,000 SNPs per config) —
on the one real TPU chip, for every size the reference publishes numbers
for (l20/l24/l28/l32), the SSD (Mamba-2) variants, and PlantCAD2-Small at
8,192 bp. Before timing, runs tools/tpu_selftest.py so every recorded BENCH
run also certifies compiled-on-chip kernel numerics.

Prints one JSON line per config plus the final summary line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline per config is measured against the reference's best published
GPU (H100, BASELINE.md throughput table); the headline stays l20.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# H100 windows/s from BASELINE.md (5000 / seconds). SSD variants are held to
# the same-size mamba1 baseline; pc2-small has no published reference number.
H100 = {"l20": 312.5, "l24": 238.1, "l28": 161.3, "l32": 106.4}

# (model, n_windows, batch) — window counts capped so the big configs keep
# total bench runtime bounded; throughput is windows/dt so the cap only
# widens the noise band, it doesn't bias the number.
LADDER = [
    ("l20", 5000, 128),
    ("l24", 3000, 128),
    ("l28", 2000, 128),
    ("l32", 1500, 128),
    ("l20-ssd", 5000, 128),
    ("l32-ssd", 1500, 128),
    ("pc2-small", 128, 16),
]


def measure(model: str, n_windows: int, batch: int) -> float:
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
    from plantcaduceus_tpu.models.config import CaduceusConfig
    from plantcaduceus_tpu.utils.model_loading import init_params_host

    window = 8192 if model.startswith("pc2") else 512
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
    from tools.tpu_selftest import run as selftest

    numerics_ok = selftest()

    results = {}
    for model, n, batch in LADDER:
        wps = measure(model, n, batch)
        results[model] = wps
        base = H100.get(model.replace("-ssd", ""))
        print(json.dumps({
            "model": model,
            "windows_per_s": round(wps, 1),
            "window_bp": 8192 if model.startswith("pc2") else 512,
            "vs_h100": round(wps / base, 3) if base else None,
        }), flush=True)

    wps = results["l20"]
    print(json.dumps({
        "metric": "zero-shot 512bp windows/sec/chip (l20)",
        "value": round(wps, 1),
        "unit": "windows/s",
        "vs_baseline": round(wps / H100["l20"], 3),
        "selftest": "pass" if numerics_ok else "FAIL",
        "ladder_vs_h100": {m: round(results[m] / H100[m.replace("-ssd", "")], 3)
                           for m, _, _ in LADDER
                           if m.replace("-ssd", "") in H100},
    }))


if __name__ == "__main__":
    main()
