"""HF Caduceus checkpoint importer: safetensors/torch.bin -> JAX pytree.

The released PlantCaduceus weights live in HF hub repos as torch state dicts
(the reference loads them via ``trust_remote_code`` —
src/zero_shot_score.py:91). This module maps that state dict onto the
framework's stacked pytree, handling:

* torch Linear [out, in] -> JAX [in, out] transposes,
* depthwise conv [di, 1, K] -> [di, K],
* BiMamba fwd/rev weight stacking onto the direction group axis (with tied
  in_proj/out_proj collapsing to Gio=1),
* per-layer -> stacked-[n_layer] layout,
* tolerant name resolution across wrapper nesting variants
  (``mixer.submodule.mamba_fwd`` vs ``mixer.mamba_fwd`` vs plain ``mixer``).

Weight-layout hazards are exactly the ones SURVEY.md §7.3 flags.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from plantcaduceus_tpu.models.config import CaduceusConfig


def load_state_dict(model_dir) -> Dict[str, np.ndarray]:
    """Load all tensors from model.safetensors / pytorch_model.bin (+shards)."""
    p = Path(model_dir)
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(p.glob("*.safetensors"))
    if st_files:
        try:
            from safetensors.numpy import load_file
            for f in st_files:
                tensors.update(load_file(str(f)))
            return tensors
        except ImportError:
            from safetensors import safe_open  # type: ignore

            for f in st_files:
                with safe_open(str(f), framework="np") as sf:
                    for k in sf.keys():
                        tensors[k] = sf.get_tensor(k)
            return tensors
    bin_files = sorted(p.glob("pytorch_model*.bin"))
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            for k, v in sd.items():
                tensors[k] = v.float().numpy()
        return tensors
    raise FileNotFoundError(f"no weight files under {p}")


def load_hf_config(model_dir) -> CaduceusConfig:
    """Translate the HF config.json into a CaduceusConfig."""
    data = json.loads((Path(model_dir) / "config.json").read_text())
    cmap = data.get("complement_map")
    if isinstance(cmap, dict):
        cmap = tuple(cmap[str(i)] if str(i) in cmap else cmap[i]
                     for i in range(len(cmap)))
    ssm = data.get("ssm_cfg") or {}
    # SSD (Mamba-2) checkpoints: our exports write ssm_variant; mamba_ssm-
    # convention configs mark ssm_cfg.layer == "Mamba2".
    is_m2 = (data.get("ssm_variant") == "mamba2"
             or ssm.get("layer") == "Mamba2")
    extra = {}
    if is_m2:
        extra = {"ssm_variant": "mamba2",
                 "head_dim": ssm.get("headdim", 128),
                 "n_groups": ssm.get("ngroups", 1),
                 "chunk_size": ssm.get("chunk_size", 128)}
    return CaduceusConfig(
        d_model=data["d_model"],
        n_layer=data["n_layer"],
        vocab_size=data.get("vocab_size", 16),
        d_state=ssm.get("d_state", 128 if is_m2 else 16),
        d_conv=ssm.get("d_conv", 4),
        expand=ssm.get("expand", 2),
        **extra,
        bidirectional=data.get("bidirectional", True),
        bidirectional_strategy=data.get("bidirectional_strategy", "add"),
        bidirectional_weight_tie=data.get("bidirectional_weight_tie", True),
        rcps=data.get("rcps", True),
        complement_map=cmap,
        rms_norm=data.get("rms_norm", True),
        norm_epsilon=data.get("norm_epsilon", 1e-5),
        residual_in_fp32=data.get("residual_in_fp32", True),
        tie_word_embeddings=data.get("tie_word_embeddings", True),
        pad_token_id=data.get("pad_token_id", 4),
    )


class AmbiguousKeyError(KeyError):
    """More than one state-dict key matches a lookup pattern. Silently
    picking one (the old shortest-match fallback) is exactly how a real
    checkpoint scores garbage without erroring — so ambiguity is fatal."""


class _Resolver:
    """Fuzzy state-dict key lookup: matches a dotted pattern allowing extra
    wrapper segments (submodule/module/model) anywhere in the path.

    Every successful lookup marks its key *consumed*; strict import uses the
    ledger to prove the whole checkpoint was mapped (no stray tensors)."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self._keys = list(sd.keys())
        self.consumed: Dict[str, int] = {}

    def find(self, *fragments: str) -> Optional[str]:
        """Return the unique key containing all fragments in order.
        Raises AmbiguousKeyError when several keys match — the caller can
        never know which tensor it would be loading."""
        pat = ".*".join(re.escape(f) for f in fragments)
        rx = re.compile(rf"(^|\.){pat}$")
        hits = [k for k in self._keys if rx.search(k)]
        if len(hits) > 1:
            raise AmbiguousKeyError(
                f"state-dict pattern {fragments} matches {len(hits)} keys — "
                f"refusing to guess: {sorted(hits)}")
        if hits:
            self.consumed[hits[0]] = self.consumed.get(hits[0], 0) + 1
            return hits[0]
        return None

    def get(self, *fragments: str) -> np.ndarray:
        k = self.find(*fragments)
        if k is None:
            raise KeyError(f"no state-dict key matching {fragments}; "
                           f"sample keys: {self._keys[:8]}")
        return np.asarray(self.sd[k], np.float32)

    def maybe(self, *fragments: str) -> Optional[np.ndarray]:
        k = self.find(*fragments)
        return None if k is None else np.asarray(self.sd[k], np.float32)

    def unconsumed(self):
        return [k for k in self._keys if k not in self.consumed]


# Non-parameter torch buffers that may ride along in a state dict; their
# absence from the mapped pytree is expected, not a mapping hole.
_IGNORABLE = re.compile(
    r"(^|\.)(position_ids|inv_freq|num_batches_tracked|rotary_emb\.[^.]+)$")


def _expected_shapes(cfg: CaduceusConfig, gio: int, has_lm_head: bool):
    """Target-pytree leaf shapes implied by the config (the ground truth a
    strict import must match — any transpose/split mistake lands here)."""
    d, di = cfg.d_model, cfg.d_inner
    N, K = cfg.d_state, cfg.d_conv
    L, V, G = cfg.n_layer, cfg.vocab_size, cfg.n_directions
    if cfg.ssm_variant == "mamba2":
        H, NGN = cfg.n_heads, cfg.n_groups * cfg.d_state
        want = {
            "embedding": (V, d),
            "norm_f_weight": (d,),
            "blocks": {
                "norm_weight": (L, d),
                "in_proj_x": (L, gio, d, di),
                "in_proj_z": (L, gio, d, di),
                "in_proj_B": (L, G, d, NGN),
                "in_proj_C": (L, G, d, NGN),
                "in_proj_dt": (L, G, d, H),
                "conv_x_w": (L, G, di, K),
                "conv_x_b": (L, G, di),
                "conv_B_w": (L, G, NGN, K),
                "conv_B_b": (L, G, NGN),
                "conv_C_w": (L, G, NGN, K),
                "conv_C_b": (L, G, NGN),
                "mixer_norm_weight": (L, gio, di),
                "out_proj": (L, gio, di, d),
                "dt_bias": (L, G, H),
                "A_log": (L, G, H),
                "D": (L, G, H),
            },
        }
        if has_lm_head:
            want["lm_head"] = (V, d)
        return want
    R = cfg.dt_rank
    want = {
        "embedding": (V, d),
        "norm_f_weight": (d,),
        "blocks": {
            "norm_weight": (L, d),
            "in_proj_x": (L, gio, d, di),
            "in_proj_z": (L, gio, d, di),
            "out_proj": (L, gio, di, d),
            "conv_w": (L, G, di, K),
            "conv_b": (L, G, di),
            "x_proj_dt": (L, G, di, R),
            "x_proj_B": (L, G, di, N),
            "x_proj_C": (L, G, di, N),
            "dt_proj_w": (L, G, R, di),
            "dt_proj_b": (L, G, di),
            "A_log": (L, G, di, N),
            "D": (L, G, di),
        },
    }
    if has_lm_head:
        want["lm_head"] = (V, d)
    return want


def _build_pytree_mamba2(r: "_Resolver", sd: Dict[str, np.ndarray],
                         cfg: CaduceusConfig, dtype):
    """SSD (Mamba-2) mapping: mamba_ssm ``Mamba2`` packing -> framework
    pytree. in_proj.weight rows are [z | x | B | C | dt]; conv1d covers the
    packed [x | B | C] stream; dt_bias/A_log/D are per-head; norm is the
    gated RMSNorm weight. Direction tying detected on the z|x rows only
    (B/C/dt stay per-direction even when in_proj is tied)."""
    G = cfg.n_directions
    di, H = cfg.d_inner, cfg.n_heads
    NGN = cfg.n_groups * cfg.d_state

    def layer(i: int):
        base = f"layers.{i}."

        def dir_name(g: int) -> str:
            return "mamba_fwd" if g == 0 else "mamba_rev"

        in_w = [r.maybe(base, dir_name(g), "in_proj.weight")
                for g in range(G)]
        if in_w[0] is None:
            in_w = [r.get(base, "in_proj.weight")]
        # rows: [z(di) | x(di) | B(NGN) | C(NGN) | dt(H)]
        zx = [w[: 2 * di].T for w in in_w if w is not None]  # [d, 2di]
        tied = len(zx) == 1 or np.array_equal(zx[0], zx[1])
        zx_kept = zx[: (1 if tied else G)]
        in_proj_z = np.stack([w[:, :di] for w in zx_kept])
        in_proj_x = np.stack([w[:, di:] for w in zx_kept])
        rest = [w if w is not None else in_w[0] for w in in_w]
        in_proj_B = np.stack([w[2 * di : 2 * di + NGN].T for w in rest])
        in_proj_C = np.stack(
            [w[2 * di + NGN : 2 * di + 2 * NGN].T for w in rest])
        in_proj_dt = np.stack([w[2 * di + 2 * NGN :].T for w in rest])

        def per_dir(*frag, transform=lambda x: x):
            vals = []
            for g in range(G):
                v = r.maybe(base, dir_name(g), *frag)
                if v is None:
                    v = r.get(base, *frag)
                vals.append(transform(v))
            return np.stack(vals)

        cw = per_dir("conv1d.weight", transform=lambda w: w[:, 0, :])
        cb = per_dir("conv1d.bias")
        # Gated-RMS-norm weight: must not collide with the BLOCK norm
        # (layers.{i}.norm.weight) — anchor the fallback on "mixer".
        norm_vals = []
        for g in range(G):
            v = r.maybe(base, dir_name(g), "norm.weight")
            if v is None:
                v = r.get(base, "mixer", "norm.weight")
            norm_vals.append(v)
        norm_w = np.stack(norm_vals)
        tied_n = G == 1 or np.array_equal(norm_w[0], norm_w[-1])
        out_w = [r.maybe(base, dir_name(g), "out_proj.weight")
                 for g in range(G)]
        if out_w[0] is None:
            out_w = [r.get(base, "out_proj.weight")]
        out_kept = [w.T for w in out_w if w is not None]
        tied_o = len(out_kept) == 1 or np.array_equal(out_kept[0],
                                                      out_kept[1])
        # Block norm: exact-suffix candidates so the pattern cannot also
        # match the mixers' gated-norm keys.
        bn = r.maybe(f"layers.{i}.norm.weight")
        if bn is None:
            bn = r.maybe(f"layers.{i}.norm.submodule.weight")
        if bn is None:
            raise KeyError(f"block norm weight not found for layer {i}")
        return {
            "norm_weight": bn,
            "in_proj_x": in_proj_x,
            "in_proj_z": in_proj_z,
            "in_proj_B": in_proj_B,
            "in_proj_C": in_proj_C,
            "in_proj_dt": in_proj_dt,
            "conv_x_w": cw[:, :di],
            "conv_x_b": cb[:, :di],
            "conv_B_w": cw[:, di : di + NGN],
            "conv_B_b": cb[:, di : di + NGN],
            "conv_C_w": cw[:, di + NGN :],
            "conv_C_b": cb[:, di + NGN :],
            "mixer_norm_weight": norm_w[:1] if tied_n else norm_w,
            "out_proj": np.stack(out_kept[: (1 if tied_o else G)]),
            "dt_bias": per_dir("dt_bias"),
            "A_log": per_dir("A_log"),
            "D": per_dir("D"),
        }

    layers = [layer(i) for i in range(cfg.n_layer)]
    f32_leaves = ("dt_bias", "A_log", "D")
    blocks = {
        k: jnp.asarray(np.stack([l[k] for l in layers]),
                       jnp.float32 if k in f32_leaves else dtype)
        for k in layers[0]
    }
    emb_key = (r.find("embeddings", "weight")
               or r.find("word_embeddings", "weight"))
    if emb_key is None:
        raise KeyError("embedding weights not found")
    params = {
        "embedding": jnp.asarray(sd[emb_key], dtype),
        "blocks": blocks,
        "norm_f_weight": jnp.asarray(r.get("norm_f", "weight"), dtype),
    }
    lm = r.maybe("lm_head", "weight")
    if lm is not None and not np.array_equal(
            lm, np.asarray(sd[emb_key], np.float32)):
        params["lm_head"] = jnp.asarray(lm, dtype)
    return params


def _build_pytree(r: "_Resolver", sd: Dict[str, np.ndarray],
                  cfg: CaduceusConfig, dtype):
    """The mapping itself: resolver + state dict -> framework pytree.
    Shared by import_params (which adds the strict bijection proof) and
    audit (which reports forensics instead of raising)."""
    if cfg.ssm_variant == "mamba2":
        return _build_pytree_mamba2(r, sd, cfg, dtype)
    G = cfg.n_directions

    def layer(i: int):
        base = f"layers.{i}."

        def dir_name(g: int) -> str:
            return "mamba_fwd" if g == 0 else "mamba_rev"

        # Tied check on in_proj: if rev weights are absent or identical,
        # collapse to Gio=1.
        in_w = [r.maybe(base, dir_name(g), "in_proj.weight") for g in range(G)]
        if in_w[0] is None:  # unidirectional naming without wrapper
            in_w = [r.get(base, "in_proj.weight")]
        tied = (
            len(in_w) == 1
            or in_w[1] is None
            or np.array_equal(in_w[0], in_w[1])
        )
        # torch in_proj.weight is [2*di, d] with rows [:di]=x, [di:]=z
        # (mamba_ssm xz.chunk(2, dim=1)); stored split and transposed.
        in_kept = [w.T for w in in_w[: (1 if tied else G)]]  # [d, 2di]
        di = in_kept[0].shape[1] // 2
        in_proj_x = np.stack([w[:, :di] for w in in_kept])
        in_proj_z = np.stack([w[:, di:] for w in in_kept])

        out_w = [r.maybe(base, dir_name(g), "out_proj.weight") for g in range(G)]
        if out_w[0] is None:
            out_w = [r.get(base, "out_proj.weight")]
        out_proj = np.stack([w.T for w in out_w[: (1 if tied else G)]])

        def per_dir(*frag, transform=lambda x: x):
            vals = []
            for g in range(G):
                v = r.maybe(base, dir_name(g), *frag)
                if v is None:
                    v = r.get(base, *frag)
                vals.append(transform(v))
            return np.stack(vals)

        # torch x_proj.weight is [R+2N, di] with rows dt / B / C.
        R = cfg.dt_rank
        N = cfg.d_state
        x_proj = per_dir("x_proj.weight", transform=lambda w: w.T)  # [G, di, R+2N]
        return {
            "norm_weight": r.get(base, "norm", "weight"),
            "in_proj_x": in_proj_x,
            "in_proj_z": in_proj_z,
            "out_proj": out_proj,
            "conv_w": per_dir("conv1d.weight", transform=lambda w: w[:, 0, :]),
            "conv_b": per_dir("conv1d.bias"),
            "x_proj_dt": x_proj[..., :R],
            "x_proj_B": x_proj[..., R : R + N],
            "x_proj_C": x_proj[..., R + N :],
            "dt_proj_w": per_dir("dt_proj.weight", transform=lambda w: w.T),
            "dt_proj_b": per_dir("dt_proj.bias"),
            "A_log": per_dir("A_log"),
            "D": per_dir("D"),
        }

    layers = [layer(i) for i in range(cfg.n_layer)]
    blocks = {
        k: jnp.asarray(np.stack([l[k] for l in layers]),
                       jnp.float32 if k in ("dt_proj_b", "A_log", "D") else dtype)
        for k in layers[0]
    }

    emb_key = r.find("embeddings", "weight") or r.find("word_embeddings", "weight")
    if emb_key is None:
        raise KeyError("embedding weights not found")
    params = {
        "embedding": jnp.asarray(sd[emb_key], dtype),
        "blocks": blocks,
        "norm_f_weight": jnp.asarray(r.get("norm_f", "weight"), dtype),
    }
    lm = r.maybe("lm_head", "weight")
    if lm is not None and not np.array_equal(lm, np.asarray(sd[emb_key], np.float32)):
        params["lm_head"] = jnp.asarray(lm, dtype)
    return params


def import_params(model_dir, cfg: Optional[CaduceusConfig] = None,
                  dtype=jnp.float32, strict: bool = True):
    """Build the framework parameter pytree from an HF checkpoint dir.

    ``strict`` (default) makes the import an exact bijection proof: after
    mapping, (a) every state-dict tensor must have been consumed (modulo
    known torch buffers) and (b) every target leaf must match the shape the
    config implies. A real released checkpoint therefore either maps
    correctly or fails loudly naming the offending key — never scores
    garbage (the silent-failure hazard of SURVEY.md §7.3 and the reference's
    trust_remote_code load at src/zero_shot_score.py:91)."""
    if cfg is None:
        cfg = load_hf_config(model_dir)
    sd = load_state_dict(model_dir)
    r = _Resolver(sd)
    G = cfg.n_directions
    params = _build_pytree(r, sd, cfg, dtype)

    if strict:
        stray = [k for k in r.unconsumed() if not _IGNORABLE.search(k)]
        if stray:
            raise ValueError(
                f"strict import: {len(stray)} state-dict tensor(s) were never "
                f"consumed by the mapping — the checkpoint layout does not "
                f"match what the importer understands: {sorted(stray)[:20]}")
        gio = int(params["blocks"]["in_proj_x"].shape[1])
        if gio not in (1, G):
            raise ValueError(f"strict import: in/out projection direction "
                             f"axis is {gio}, expected 1 (tied) or {G}")
        want = _expected_shapes(cfg, gio, "lm_head" in params)
        errs = []
        for name, leaf, expect in (
                [(k, params[k], want[k]) for k in want if k != "blocks"]
                + [(f"blocks.{k}", params["blocks"][k], want["blocks"][k])
                   for k in want["blocks"]]):
            if tuple(leaf.shape) != expect:
                errs.append(f"{name}: got {tuple(leaf.shape)}, want {expect}")
        if errs:
            raise ValueError(
                "strict import: mapped tensor shapes disagree with the "
                "config (transposed/misplaced weights?):\n  "
                + "\n  ".join(errs))
    return params, cfg


def audit(model_dir, cfg: Optional[CaduceusConfig] = None) -> dict:
    """Dry-audit an HF checkpoint dir: run the full key mapping and report
    forensics instead of raising.

    Returns a dict with the complete consumed/unconsumed key ledger and the
    mapped-vs-expected shape table, so a layout mismatch in a newly released
    checkpoint is diagnosable in one command (``tools/parity_check.py
    --audit <dir>``) rather than by bisecting strict-import exceptions.
    Never builds device arrays beyond what the mapping itself stacks, and
    never raises on mapping/shape problems — they land in ``"error"`` /
    ``"shape_mismatches"``."""
    report: dict = {"model_dir": str(model_dir)}
    try:
        if cfg is None:
            cfg = load_hf_config(model_dir)
        report["config"] = {
            "d_model": cfg.d_model, "n_layer": cfg.n_layer,
            "vocab_size": cfg.vocab_size, "d_state": cfg.d_state,
            "d_conv": cfg.d_conv, "expand": cfg.expand,
            "n_directions": cfg.n_directions, "rcps": cfg.rcps,
        }
        sd = load_state_dict(model_dir)
    except Exception as e:  # unreadable dir: report, don't raise
        report["error"] = f"{type(e).__name__}: {e}"
        report["ok"] = False
        return report
    report["n_tensors"] = len(sd)
    r = _Resolver(sd)
    params = None
    try:
        params = _build_pytree(r, sd, cfg, jnp.float32)
    except Exception as e:
        report["error"] = f"{type(e).__name__}: {e}"
    report["consumed"] = {k: tuple(np.asarray(sd[k]).shape)
                          for k in sorted(r.consumed)}
    unconsumed = r.unconsumed()
    report["ignored_buffers"] = sorted(
        k for k in unconsumed if _IGNORABLE.search(k))
    report["stray"] = {k: tuple(np.asarray(sd[k]).shape)
                       for k in sorted(unconsumed)
                       if not _IGNORABLE.search(k)}
    if params is not None:
        gio = int(params["blocks"]["in_proj_x"].shape[1])
        report["tied_in_out_proj"] = gio == 1
        want = _expected_shapes(cfg, gio, "lm_head" in params)
        table, mismatches = {}, []
        for name, leaf, expect in (
                [(k, params[k], want[k]) for k in want if k != "blocks"]
                + [(f"blocks.{k}", params["blocks"][k], want["blocks"][k])
                   for k in want["blocks"]]):
            got = tuple(leaf.shape)
            table[name] = {"got": got, "want": expect}
            if got != expect:
                mismatches.append(name)
        report["shapes"] = table
        report["shape_mismatches"] = mismatches
        report["ok"] = not mismatches and not report["stray"]
    else:
        report["ok"] = False
    return report
