"""Deterministic collective audit of the sharded programs (SCALING artifact).

The virtual-CPU-mesh *timing* proxy is noise-dead on this contended 4-core
host (r3/r4: identical code measured 0.795 vs 0.674 "efficiency" between
runs). This tool replaces it as the scaling signal with a logic-level audit
that host contention cannot corrupt: compile the REAL sharded scoring
forward and the REAL training step on an 8-virtual-device CPU mesh, read
the post-SPMD HLO, and pin every collective XLA will issue on a real pod —
op kinds, instruction counts, payload bytes per step.

From the byte inventory we compute a *projected* 1->N scaling efficiency
against the measured single-chip step time (tests/goldens/
train_bench_anchors.json), with the interconnect assumptions stated
explicitly, instead of timing 8 virtual devices that share one physical
core. The audit is deterministic for a given jax version; a pinned golden
(tests/goldens/collective_audit.json, tests/test_collective_audit.py) fails
if a code change adds or grows a collective.

Replaces tools/bench_scaling.py as the SCALING_r{N}.json payload; the
timing proxy remains runnable but demoted to informational.

Usage:
    PCAD_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/collective_audit.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PCAD_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

from plantcaduceus_tpu.utils.platform import maybe_force_platform  # noqa: E402

maybe_force_platform()

# Audit geometry: small width/depth so CPU compiles stay in seconds — the
# collective STRUCTURE (which ops, how many, which tensors they carry) is
# what the golden pins; payload bytes for the real presets are obtained by
# exact parameter-count scaling of the param-shaped collectives (gradient
# all-reduce bytes == 4 * n_params by construction, verified against the
# audited byte count below).
AUDIT_D_MODEL = 128
AUDIT_N_LAYER = 2
AUDIT_BATCH = 16          # global batch over the 8-device data axis
AUDIT_WINDOW = 512

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

# Collective HLO opcodes (sync and async-start forms; -done carries no
# payload of its own).
_COLL_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*(\([^)]*\)|[\w\[\],{}\s]+?)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all|"
    r"collective-broadcast)(?:-start)?\(", re.M)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of an HLO shape string (handles tuples)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue  # token[] etc.
        n = 1
        for d in dims.split(","):
            if d.strip():
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collect_collectives(hlo_text: str) -> dict:
    """-> {opcode: {"count": n, "bytes": total_payload_bytes}} from
    post-optimization HLO."""
    out: dict = {}
    for m in _COLL_RE.finditer(hlo_text):
        shape_text, op = m.group(1), m.group(2)
        rec = out.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += _shape_bytes(shape_text)
    return out


def _param_count(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _small_cfg(ssm_variant: str = "mamba1"):
    from plantcaduceus_tpu.models.config import CaduceusConfig

    kw = {}
    if ssm_variant != "mamba1":
        kw["ssm_variant"] = ssm_variant
    return CaduceusConfig(d_model=AUDIT_D_MODEL, n_layer=AUDIT_N_LAYER, **kw)


def audit_scoring(n_dev: int = 8) -> dict:
    """Post-SPMD collectives of the data-parallel scoring forward."""
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.parallel import mesh as meshlib
    from plantcaduceus_tpu.utils.model_loading import init_params_host

    cfg = _small_cfg()
    params = init_params_host(cfg)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=n_dev),
                             devices=jax.devices()[:n_dev])
    runner = InferenceRunner(params, cfg, mesh=mesh, dtype=jnp.bfloat16,
                             batch_size=AUDIT_BATCH)
    nuc = jnp.asarray([7, 8, 9, 10], jnp.int32)
    pos = AUDIT_WINDOW // 2 - 1

    def extract(out):
        sel = out["logits"][:, pos, :][:, nuc]
        return jax.nn.softmax(sel, axis=-1)

    fwd = runner._build_fwd(extract, want_hidden=False)
    ids = jnp.zeros((AUDIT_BATCH, AUDIT_WINDOW), jnp.int32)
    ids = jax.device_put(ids, runner._batch_sharding)
    hlo = fwd.lower(runner.params, ids).compile().as_text()
    colls = collect_collectives(hlo)
    return {"mesh": f"data={n_dev}", "params": _param_count(params),
            "global_batch": AUDIT_BATCH, "window": AUDIT_WINDOW,
            "collectives": colls,
            "total_bytes": sum(c["bytes"] for c in colls.values())}


def audit_training(n_dev: int = 8, fsdp: int = 1,
                   ssm_variant: str = "mamba1") -> dict:
    """Post-SPMD collectives of one optimizer step (grad psum, fsdp
    gather/scatter when sharded)."""
    import jax
    import jax.numpy as jnp
    import optax

    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.parallel import mesh as meshlib
    from plantcaduceus_tpu.train import step as step_lib

    cfg = _small_cfg(ssm_variant)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    n_params = _param_count(params)
    mesh = meshlib.make_mesh(
        meshlib.MeshConfig(data=n_dev // fsdp, fsdp=fsdp),
        devices=jax.devices()[:n_dev])
    opt = optax.adamw(2e-4)
    init_state, train_step, _ = step_lib.make_train_step(
        cfg, opt, mesh, params, dtype=jnp.bfloat16, remat=True)
    state = init_state(params)
    batch = {
        "input_ids": jnp.zeros((AUDIT_BATCH, AUDIT_WINDOW), jnp.int32),
        "labels": jnp.full((AUDIT_BATCH, AUDIT_WINDOW), -100, jnp.int32),
        "loss_weights": jnp.ones((AUDIT_BATCH, AUDIT_WINDOW), jnp.float32),
    }
    hlo = train_step.lower(state, batch).compile().as_text()
    colls = collect_collectives(hlo)
    return {"mesh": f"data={n_dev // fsdp}xfsdp={fsdp}", "params": n_params,
            "global_batch": AUDIT_BATCH, "window": AUDIT_WINDOW,
            "collectives": colls,
            "total_bytes": sum(c["bytes"] for c in colls.values())}


# ---------------------------------------------------------------------------
# Projection: bytes-over-ICI vs measured single-chip compute
# ---------------------------------------------------------------------------

# TPU v5e interconnect: 2D torus, 4 ICI links/chip, ~45 GB/s per link per
# direction (public "How to Scale Your Model" numbers). A bidirectional
# ring all-reduce of S bytes moves 2*(N-1)/N * S per chip; with 2 usable
# rings (2D torus) the per-chip wall time is that volume / (2 * 45 GB/s).
ICI_LINK_GBPS = 45e9
ICI_RINGS = 2

ANCHORS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "train_bench_anchors.json")


def _project(n_params: int, step_s: float, n_dev: int = 8) -> dict:
    """Projected DP scaling for a real preset: gradient all-reduce bytes
    scale exactly with parameter count (fp32 grads, one psum per step —
    verified against the audited small-geometry bytes), so
    comm_s = 2(N-1)/N * 4*n_params / (rings * link_bw) against the
    anchor-measured single-chip step time."""
    grad_bytes = 4.0 * n_params
    comm_s = (2.0 * (n_dev - 1) / n_dev) * grad_bytes / (
        ICI_RINGS * ICI_LINK_GBPS)
    eff = step_s / (step_s + comm_s)
    return {"grad_allreduce_bytes": int(grad_bytes),
            "compute_s_per_step": step_s,
            "comm_s_no_overlap": round(comm_s, 6),
            "projected_efficiency_no_overlap": round(eff, 4)}


# Parameter counts of the real presets (measured by bench.py lanes; also
# recomputable via CaduceusConfig.preset + init_params).
def preset_params(name: str) -> int:
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig

    import jax

    cfg = CaduceusConfig.preset(name)
    return _param_count(caduceus.init_params(jax.random.PRNGKey(0), cfg))


def build_artifact(n_dev: int = 8, include_fsdp: bool = True,
                   include_ssd: bool = True) -> dict:
    """The full SCALING artifact payload (audit + projections)."""
    audits = {"scoring_dp8": audit_scoring(n_dev),
              "train_dp8": audit_training(n_dev, fsdp=1)}
    if include_fsdp:
        audits["train_dp4_fsdp2"] = audit_training(n_dev, fsdp=2)
    if include_ssd:
        audits["train_dp8_ssd"] = audit_training(n_dev, fsdp=1,
                                                 ssm_variant="mamba2")

    # Sanity tie between audit and projection arithmetic: the small-geometry
    # gradient all-reduce payload must equal 4 bytes * n_params (fp32 grads,
    # one reduction of every gradient tensor per step).
    t = audits["train_dp8"]
    ar = t["collectives"].get("all-reduce", {"bytes": 0})
    grad_bytes_expected = 4 * t["params"]
    # all-reduce also carries the scalar loss/accuracy/grad-norm metrics;
    # allow a small absolute slack for those.
    tie = abs(ar["bytes"] - grad_bytes_expected) <= 4096 + 0.02 * grad_bytes_expected

    anchors = {}
    try:
        anchors = json.load(open(ANCHORS_PATH))
        if isinstance(anchors, dict) and "lanes" in anchors:
            anchors = {k: v if isinstance(v, (int, float)) else v.get("tokens_per_s")
                       for k, v in anchors["lanes"].items()}
    except Exception:
        pass

    projections = {}
    lane_geometry = {"l20": (32, 512), "l32": (32, 512),
                     "l20-ssd": (32, 512), "l32-ssd": (32, 512),
                     "pc2-small": (8, 8192), "pc2-small-ssd": (8, 8192),
                     "pc2-medium": (2, 8192)}
    for lane, (batch, window) in lane_geometry.items():
        tps = anchors.get(lane)
        if not tps:
            continue
        step_s = batch * window / float(tps)
        projections[f"train_{lane}_dp{n_dev}"] = {
            "params": preset_params(lane),
            **_project(preset_params(lane), round(step_s, 4), n_dev)}

    return {
        "mode": "deterministic collective audit: post-SPMD HLO of the real "
                "8-virtual-device programs (kinds/counts/payload bytes), "
                "projected to pod scaling analytically — replaces the "
                "noise-dead virtual-CPU-mesh timing proxy (r4 verdict #3)",
        "assumptions": {
            "ici_link_bytes_per_s": ICI_LINK_GBPS,
            "ici_rings_used": ICI_RINGS,
            "allreduce_model": "bidirectional ring, 2(N-1)/N volume, "
                               "no compute/comm overlap (conservative "
                               "lower bound on efficiency)",
            "device": "TPU v5e (45 GB/s/link/direction, 4 links, 2D torus)",
        },
        "audit_geometry": {"d_model": AUDIT_D_MODEL, "n_layer": AUDIT_N_LAYER,
                           "global_batch": AUDIT_BATCH,
                           "window": AUDIT_WINDOW},
        "audits": audits,
        "audit_projection_tie": {
            "grad_allreduce_bytes_audited": ar["bytes"],
            "grad_bytes_expected_4x_params": grad_bytes_expected,
            "consistent": bool(tie)},
        "projections_dp8": projections,
        "scoring_note": "the DP scoring forward issues "
                        f"{audits['scoring_dp8']['total_bytes']} collective "
                        "bytes per batch (weights pre-replicated, outputs "
                        "device-local) — projected scaling ~1.0; the >=85% "
                        "north star is bounded by input/output fan-out, "
                        "not ICI",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="write artifact here")
    ap.add_argument("--no-fsdp", action="store_true")
    ap.add_argument("--no-ssd", action="store_true")
    args = ap.parse_args()
    art = build_artifact(include_fsdp=not args.no_fsdp,
                         include_ssd=not args.no_ssd)
    text = json.dumps(art, indent=1)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(text)
    print(text)


if __name__ == "__main__":
    main()
