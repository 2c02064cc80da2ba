"""pc2-large activation-memory proxy: one pipeline stage on one chip.

The documented pc2-large training recipe (docs/PLANTCAD2.md: 8,192 bp,
global batch 8, data=2 x fsdp=2 x pipe=2, remat) was validated for
parameter/optimizer sharding by the multichip dryrun, but its ACTIVATION
term at the real window was arithmetic only (VERDICT r4 #5). This tool
measures it: a 24-layer d_model=1536 model — exactly one GPipe stage of
pc2-large — trains on ONE chip at 8,192 bp, batch 1, remat, full AdamW
state. That single-chip configuration strictly upper-bounds the per-chip
footprint of the recipe's stage (which holds HALF the optimizer state at
fsdp=2 and the same per-microbatch activations), so if this fits and
steps, the recipe's activation budget is validated by measurement, not
hope.

Run on the TPU:  python tools/pc2_stage_proxy.py [--layers 24]
Prints one JSON line with s/step and the device memory stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24,
                    help="stage depth (24 = one pipe=2 stage of l48)")
    ap.add_argument("--d-model", type=int, default=1536)
    ap.add_argument("--window", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--ssd", action="store_true",
                    help="mamba2 (SSD) variant of the stage")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig
    from plantcaduceus_tpu.parallel import mesh as meshlib
    from plantcaduceus_tpu.train import step as step_lib
    from plantcaduceus_tpu.train.masking import MlmCollator

    kw = dict(ssm_variant="mamba2", d_state=128) if args.ssd else \
        dict(d_state=16)
    cfg = CaduceusConfig(d_model=args.d_model, n_layer=args.layers, **kw)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    mesh = meshlib.make_mesh()
    rng = np.random.default_rng(0)
    raw = rng.integers(7, 11,
                       size=(args.batch, args.window)).astype(np.int32)
    b = MlmCollator(DnaTokenizer(), seed=0)(raw)
    b["loss_weights"] = np.ones_like(raw, np.float32)
    batch_dev = {k: jnp.asarray(v) for k, v in b.items()}

    opt = optax.adamw(2e-4)
    init_state, train_step, _ = step_lib.make_train_step(
        cfg, opt, mesh, params, dtype=jnp.bfloat16, remat=True)
    state = init_state(params)

    for i in range(args.steps):
        state, m = train_step(state, batch_dev)
        float(m["loss"])
    t0 = time.time()
    for i in range(args.steps):
        state, m = train_step(state, batch_dev)
        float(m["loss"])
    dt = (time.time() - t0) / args.steps

    stats = {}
    try:
        ms = jax.devices()[0].memory_stats() or {}
        stats = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                    "bytes_limit") if k in ms}
    except Exception:
        pass
    print(json.dumps({
        "stage": f"l{args.layers}/d{args.d_model}"
                 + ("-ssd" if args.ssd else ""),
        "params": n_params,
        "window": args.window, "batch": args.batch,
        "s_per_step": round(dt, 3),
        "tokens_per_s": round(args.batch * args.window / dt),
        "f32_state_gb": round(16 * n_params / 2**30, 2),
        "memory_stats": {k: round(v / 2**30, 2) for k, v in stats.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
