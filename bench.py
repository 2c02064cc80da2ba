"""Round benchmark: inference ladder + training lane + scaling artifact.

Mirrors the reference's headline benchmark — wall-clock to zero-shot score
masked 512-bp windows (reference README.md:331-385, 5,000 SNPs per config) —
on the one real TPU chip, for every size the reference publishes numbers
for (l20/l24/l28/l32), the SSD (Mamba-2) variants, and the full PlantCAD2
family at 8,192 bp (docs/PlantCAD2-overview.md:17-21). Before timing, runs
tools/tpu_selftest.py so every recorded BENCH run also certifies
compiled-on-chip kernel numerics.

Also times the TRAINING path (s/step, tok/s, MFU at the reference recipe's
per-device batch 32 with remat, plus one LoRA-with-accum config) and
regression-guards it against the best previously recorded numbers; and runs
tools/bench_scaling.py over the virtual CPU mesh in a subprocess, recording
SCALING_r{N}.json next to the driver's BENCH_r{N}.json.

Prints one JSON line per config plus the final summary line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline per config is measured against the reference's best published
GPU (H100, BASELINE.md throughput table); the headline stays l20.
"""

import glob
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# H100 windows/s from BASELINE.md (5000 / seconds). SSD variants are held to
# the same-size mamba1 baseline; the PlantCAD2 family has no published
# reference throughput (tok/s reported instead, vs the 512-bp ladder).
H100 = {"l20": 312.5, "l24": 238.1, "l28": 161.3, "l32": 106.4}

# (model, n_windows, batch) — window counts capped so the big configs keep
# total bench runtime bounded; throughput is windows/dt so the cap only
# widens the noise band, it doesn't bias the number. pc2 sizes get >=256
# windows (>=30 s of work) so the number is stable, not a noise-band read.
LADDER = [
    ("l20", 5000, 128),
    ("l24", 3000, 128),
    ("l28", 2000, 128),
    ("l32", 1500, 128),
    ("l20-ssd", 5000, 128),
    ("l32-ssd", 1500, 128),
    ("pc2-small", 1024, 32),
    ("pc2-medium", 256, 16),
    ("pc2-large", 128, 8),
    # r3's SSD long-context batch cliff is fixed (fused interior keeps
    # chunk states in VMEM; batch 8/16/32 measured within 2% at 8192 bp),
    # so the small-ssd lane runs un-pinned at batch 32. Batch 64 at
    # 8192 bp exceeds HBM at compile; medium-ssd stays at 8 for the same
    # capacity (not cliff) reason at its 2x width.
    ("pc2-small-ssd", 512, 32),
    ("pc2-medium-ssd", 128, 8),
]

# Training-lane anchors: best previously recorded tok/s (DESIGN.md §5 arc,
# r2: l20 0.33 s/step = 49.5k tok/s at batch 32 remat). A new number below
# 85% of its anchor is a regression and fails loudly in the summary.
TRAIN_ANCHORS_PATH = os.path.join(REPO, "tests", "goldens",
                                  "train_bench_anchors.json")
# Regression-guard noise band: a lane below this fraction of its ratcheted
# anchor fails loudly; deltas inside the band are still recorded per lane
# (delta_vs_anchor_pct) so slow multi-round drift stays visible.
ANCHOR_TOLERANCE = 0.85
TRAIN_LANE = [
    # (name, model, batch, window, grad_accum)
    ("l20", "l20", 32, 512, 1),
    ("l32", "l32", 32, 512, 1),
    ("l20-ssd", "l20-ssd", 32, 512, 1),
    ("l32-ssd", "l32-ssd", 32, 512, 1),
    ("pc2-small", "pc2-small", 8, 8192, 1),
    # Long-context SSD training: the fused mamba2 training forward (r4)
    # puts the -ssd family ahead at 8192 bp too (27.6k vs 21.1k tok/s
    # after the pre-SiLU adjoint, r4).
    ("pc2-small-ssd", "pc2-small-ssd", 8, 8192, 1),
    # PC2-Medium (l48/d1024, 338M) trains on ONE chip at 8192 bp only up
    # to batch 2 (batch 4 OOMs even with remat); the recipe scales batch
    # via grad-accum. PC2-Large (l48/d1536) does NOT fit single-chip at
    # 8192 bp even at batch 1 — its training recipe is the multi-chip
    # fsdp/pipe mesh validated at real geometry in dryrun_multichip
    # (docs/PLANTCAD2.md "Training the big configs").
    ("pc2-medium", "pc2-medium", 2, 8192, 1),
    ("lora-l20-accum4", "l20", 8, 512, 4),
]

# bf16 peak FLOPs/s per chip by device kind (public TPU specs); MFU is
# reported only when the kind is recognised.
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12, "TPU v6e": 918e12,
}


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


def _param_count(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def measure_train(model: str, batch: int, window: int,
                  grad_accum: int) -> dict:
    """One training config: s/step, tok/s, MFU. grad_accum>1 routes through
    the LoRA step (the reference's accumulation-heavy recipe);
    otherwise the full MLM pre-train step at the reference's batch 32."""
    import jax
    import jax.numpy as jnp
    import optax

    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig
    from plantcaduceus_tpu.parallel import mesh as meshlib
    from plantcaduceus_tpu.train import step as step_lib
    from plantcaduceus_tpu.train.masking import MlmCollator

    cfg = CaduceusConfig.preset(model)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    n_params = _param_count(params)
    mesh = meshlib.make_mesh()
    tok = DnaTokenizer()
    rng = np.random.default_rng(0)
    rows = batch * grad_accum
    raw = rng.integers(7, 11, size=(rows, window)).astype(np.int32)
    b = MlmCollator(tok, seed=0)(raw)
    b["loss_weights"] = np.ones_like(raw, np.float32)
    batch_dev = {k: jnp.asarray(v) for k, v in b.items()}

    lora = grad_accum > 1
    if lora:
        from plantcaduceus_tpu.train import lora as lora_lib

        cfg_l = lora_lib.LoraConfig()
        opt = optax.adamw(1e-3)
        train_step, _ = lora_lib.make_lora_train_step(
            cfg, cfg_l, opt, mesh, params, dtype=jnp.bfloat16,
            grad_accum=grad_accum)
        state = lora_lib.init_lora_state(jax.random.PRNGKey(1), params, cfg,
                                         cfg_l, 2, opt)
        base = meshlib.shard_params(params, mesh, replicated=True)
        lbatch = {"input_ids": batch_dev["input_ids"],
                  "labels": jnp.asarray(rng.integers(0, 2, rows))}
        key = jax.random.PRNGKey(2)

        def one_step(i):
            nonlocal state
            state, m = train_step(state, base, lbatch,
                                  jax.random.fold_in(key, i))
            return m
    else:
        opt = optax.adamw(2e-4)
        init_state, train_step, _ = step_lib.make_train_step(
            cfg, opt, mesh, params, dtype=jnp.bfloat16, remat=True,
            grad_accum=grad_accum)
        state = init_state(params)

        def one_step(i):
            nonlocal state
            state, m = train_step(state, batch_dev)
            return m

    # Compile, then warm up PAST the remote runtime's slow-start: the first
    # ~12 steps on a fresh donated-state chain run 3-10x slower through the
    # relay before settling (measured: l20 0.89 s/step over the first 16 vs
    # 0.29 steady-state). Timing must start at steady state.
    n_warm, n_timed = 12, 12
    for i in range(n_warm):
        m = one_step(i)
        if (i + 1) % 4 == 0:
            float(m["loss"])
    float(m["loss"])
    t0 = time.time()
    for i in range(n_warm, n_warm + n_timed):
        m = one_step(i)
        if (i + 1) % 4 == 0:  # bounded run-ahead without per-step relay cost
            float(m["loss"])
    float(m["loss"])
    dt = (time.time() - t0) / n_timed

    tokens = rows * window
    toks_per_s = tokens / dt
    # Training FLOPs ~ 6 * params * tokens (fwd 2x + bwd 4x matmul FLOPs);
    # for LoRA only ~2/6 of that is backward through frozen weights — keep
    # the standard 6x as the conventional upper-bound estimate.
    import jax as _jax

    kind = _jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_FLOPS.items() if k in kind), None)
    mfu = (6.0 * n_params * toks_per_s / peak) if peak else None
    return {"s_per_step": round(dt, 4), "tokens_per_s": round(toks_per_s),
            "mfu": round(mfu, 4) if mfu else None,
            "params": n_params}


CONVERGENCE_ANCHOR_PATH = os.path.join(REPO, "tests", "goldens",
                                       "convergence_anchor.json")


def measure_convergence() -> dict:
    """Planted-structure learning check (VERDICT r3 #2): pre-train a tiny
    config for 200 steps through the real pipeline at the recipe's
    soft-mask weight 0.1 and probe what it learned. Guarded against the
    pinned anchor so the lane fails if the optimizer/masking/weighting
    wiring stops LEARNING, not just stops descending."""
    import jax.numpy as jnp

    from plantcaduceus_tpu.models.config import CaduceusConfig
    from plantcaduceus_tpu.train import convergence as C

    cfg = CaduceusConfig(d_model=64, n_layer=2, vocab_size=16, d_state=8)
    run = C.train_planted(cfg, steps=200, batch=16, n_corpus=512,
                          soft_masked_weight=0.1, dtype=jnp.bfloat16)
    m = C.evaluate_structure(run)
    return {"final_loss": round(run["final_loss"], 4),
            "loss_trajectory": [[s, round(v, 4)] for s, v in run["losses"]],
            "motif_accuracy": round(m["motif_accuracy"], 4),
            "background_accuracy": round(m["background_accuracy"], 4),
            "repeat_loss": round(m["repeat_loss"], 4)}


def check_convergence() -> list:
    """-> list of learn-regression strings (empty = healthy); prints the
    convergence JSON line and refreshes the anchor (best loss kept)."""
    try:
        r = measure_convergence()
    except Exception as e:
        print(json.dumps({"convergence": "error", "error": str(e)[:200]}),
              flush=True)
        return [f"convergence lane failed to run: {e!r:.120}"]
    try:
        anchor = json.load(open(CONVERGENCE_ANCHOR_PATH))
    except Exception:
        anchor = {}
    probs = []
    if r["motif_accuracy"] < 0.8:
        probs.append(f"motif accuracy {r['motif_accuracy']} < 0.8 floor "
                     "(recipe no longer learns planted structure)")
    if r["background_accuracy"] > 0.45:
        probs.append(f"background accuracy {r['background_accuracy']} > "
                     "0.45 (label/mask leakage)")
    if anchor.get("final_loss") and \
            r["final_loss"] > 1.15 * anchor["final_loss"]:
        probs.append(f"loss@200 {r['final_loss']} > 115% of anchor "
                     f"{anchor['final_loss']}")
    print(json.dumps({"convergence": r,
                      "anchor_final_loss": anchor.get("final_loss"),
                      "learn_regressions": probs or None}), flush=True)
    best = min(r["final_loss"], anchor.get("final_loss", float("inf")))
    if best != anchor.get("final_loss"):
        with open(CONVERGENCE_ANCHOR_PATH, "w") as fh:
            json.dump({"final_loss": best,
                       "motif_accuracy_floor": 0.8}, fh, indent=1)
    return probs


def run_scaling_artifact() -> None:
    """Emit SCALING_r{N}.json (the next round index, matching the driver's
    BENCH_r{N} numbering) from a CPU-virtual-mesh subprocess: the logic-level
    proxy for the >=85% 1->N scaling north star until a real pod exists."""
    rounds = [int(m.group(1)) for f in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
              if (m := re.search(r"BENCH_r(\d+)\.json$", f))]
    n = (max(rounds) + 1) if rounds else 1
    out_path = os.path.join(REPO, f"SCALING_r{n:02d}.json")
    env = dict(os.environ, PCAD_PLATFORM="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8").strip())
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_scaling.py"),
             "--model", "l20", "--d-model", "128", "--n-layer", "2",
             "--windows", "256", "--batch", "16", "--devices", "1", "8"],
            env=env, capture_output=True, text=True, timeout=1200)
        lines = [json.loads(ln) for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        payload = {"mode": "virtual-cpu-mesh proxy (l20 geometry, reduced "
                           "size for round-flow runtime). All virtual "
                           "devices share one physical CPU, so ideal weak-"
                           "scaling efficiency is 1/N here; "
                           "vs_shared_core_ideal is the logic-overhead "
                           "proxy, raw efficiency is the real-pod metric.",
                   "noise": "median of 3 repeats + best-of estimator, "
                            "min/max recorded per point (r4). The r3 "
                            "0.795-vs-0.674 'regression' was noise, and "
                            "the overhead has a name: VM co-tenancy + XLA "
                            "host-thread scheduling on the 4 shared cores "
                            "— identical code measured n=1 medians of "
                            "4.2-6.6 win/s BETWEEN runs (within-run "
                            "spreads up to 1.7-6.7). The proxy cannot be "
                            "made stable on this box; its stable signal "
                            "is absolute: the 8-virtual-device mesh "
                            "sustains ~3 win/s wherever 1-device gets "
                            "4.5-6.6, bounding mesh-logic overhead by the "
                            "host noise floor. The >=85% north star is a "
                            "real-pod measurement (run this same tool "
                            "there).",
                   "results": lines, "rc": proc.returncode}
    except Exception as e:  # never fail the bench over the side artifact
        payload = {"error": str(e)}
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    last = (payload.get("results") or [{}])[-1]
    print(json.dumps({"scaling_artifact": os.path.basename(out_path),
                      **{k: last[k] for k in ("scaling_efficiency",
                                              "vs_shared_core_ideal",
                                              "vs_shared_core_ideal_best")
                         if k in last}}), flush=True)


def main():
    from tools.tpu_selftest import run as selftest

    numerics_ok = selftest()

    results = {}
    for model, n, batch in LADDER:
        window = 8192 if model.startswith("pc2") else 512
        try:
            wps = measure(model, n, batch)
        except Exception as e:
            print(json.dumps({"model": model, "error": str(e)[:200]}),
                  flush=True)
            continue
        results[model] = wps
        base = H100.get(model.replace("-ssd", ""))
        print(json.dumps({
            "model": model,
            "windows_per_s": round(wps, 1),
            "window_bp": window,
            "tokens_per_s": round(wps * window),
            "vs_h100": round(wps / base, 3) if base else None,
        }), flush=True)

    # --- training lane -----------------------------------------------------
    try:
        anchors = json.load(open(TRAIN_ANCHORS_PATH))
    except Exception:
        anchors = {}
    train_results, regressions = {}, []
    for name, model, batch, window, accum in TRAIN_LANE:
        try:
            r = measure_train(model, batch, window, accum)
        except Exception as e:
            print(json.dumps({"train": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        anchor = anchors.get(name)
        # Surface sub-tolerance drift explicitly: the 0.85 guard means a few
        # percent can be lost silently each round — record the per-lane delta
        # so multi-round decay is visible before it trips the guard.
        if anchor:
            r["delta_vs_anchor_pct"] = round(
                100.0 * (r["tokens_per_s"] / anchor - 1.0), 2)
        train_results[name] = r
        if anchor and r["tokens_per_s"] < ANCHOR_TOLERANCE * anchor:
            regressions.append(
                f"{name}: {r['tokens_per_s']} tok/s < "
                f"{ANCHOR_TOLERANCE:.0%} of anchor {anchor}")
        print(json.dumps({"train": name, **r,
                          "anchor_tokens_per_s": anchor}), flush=True)
    if regressions:
        print(json.dumps({"TRAIN_REGRESSION": regressions}), flush=True)
    # Ratchet anchors up (never down) so future rounds are guarded by the
    # best recorded numbers.
    new_anchors = dict(anchors)
    for name, r in train_results.items():
        new_anchors[name] = max(anchors.get(name, 0), r["tokens_per_s"])
    if new_anchors != anchors:
        os.makedirs(os.path.dirname(TRAIN_ANCHORS_PATH), exist_ok=True)
        with open(TRAIN_ANCHORS_PATH, "w") as fh:
            json.dump(new_anchors, fh, indent=1)

    learn_regressions = check_convergence()

    run_scaling_artifact()

    # Headline may be absent if the l20 measurement itself failed — emit the
    # summary with a null headline plus the recorded per-model errors rather
    # than dying on KeyError after all the other work.
    wps = results.get("l20")
    print(json.dumps({
        "metric": "zero-shot 512bp windows/sec/chip (l20)",
        "value": round(wps, 1) if wps else None,
        "unit": "windows/s",
        "vs_baseline": round(wps / H100["l20"], 3) if wps else None,
        "selftest": "pass" if numerics_ok else "FAIL",
        "ladder_vs_h100": {m: round(results[m] / H100[m.replace("-ssd", "")], 3)
                           for m in results
                           if m.replace("-ssd", "") in H100},
        "pc2_tokens_per_s": {m: round(results[m] * 8192)
                             for m in results if m.startswith("pc2")},
        "train": {k: {"s_per_step": v["s_per_step"],
                      "tokens_per_s": v["tokens_per_s"], "mfu": v["mfu"],
                      "delta_vs_anchor_pct": v.get("delta_vs_anchor_pct")}
                  for k, v in train_results.items()},
        "anchor_tolerance": ANCHOR_TOLERANCE,
        "train_regressions": regressions or None,
        "learn_regressions": learn_regressions or None,
    }))


if __name__ == "__main__":
    main()
