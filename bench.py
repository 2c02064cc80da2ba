"""Round benchmark: zero-shot scoring throughput (512bp windows/sec/chip).

Mirrors the reference's headline benchmark — wall-clock to zero-shot score
5,000 SNPs with PlantCaduceus_l20 (reference README.md:331-385) — on the one
real TPU chip. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the reference's best published GPU (H100,
16 s for 5k SNPs -> 312.5 windows/s, BASELINE.md).
"""

import json
import time

import numpy as np

H100_L20_WINDOWS_PER_S = 5000 / 16.0  # BASELINE.md l20 H100

N_WINDOWS = 5000
BATCH = 128
MODEL = "l20"


def main():
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
    from plantcaduceus_tpu.models.config import CaduceusConfig
    from plantcaduceus_tpu.utils.model_loading import init_params_host

    cfg = CaduceusConfig.preset(MODEL)
    params = init_params_host(cfg)
    tok = DnaTokenizer()
    runner = InferenceRunner(params, cfg, dtype=jnp.bfloat16, batch_size=BATCH)

    rng = np.random.default_rng(0)
    ids = rng.integers(7, 11, size=(N_WINDOWS, 512)).astype(np.int32)
    ids[:, 255] = tok.mask_token_id
    nuc = [7, 8, 9, 10]

    # Warmup / compile.
    runner.masked_probs(ids[:BATCH], nuc, 255, progress=False)

    t0 = time.time()
    probs = runner.masked_probs(ids, nuc, 255, progress=False)
    dt = time.time() - t0
    assert probs.shape == (N_WINDOWS, 4) and np.isfinite(probs).all()

    wps = N_WINDOWS / dt
    print(json.dumps({
        "metric": f"zero-shot 512bp windows/sec/chip ({MODEL})",
        "value": round(wps, 1),
        "unit": "windows/s",
        "vs_baseline": round(wps / H100_L20_WINDOWS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
