"""Export framework parameters to an HF-style torch state dict.

Inverse of compat.hf_import: produces a directory with config.json and
pytorch_model.bin using the Caduceus remote-code naming/packing conventions
(RCPS wrappers, BiMamba fwd/rev, packed in_proj [2di, d] and x_proj
[R+2N, di]), so weights trained here round-trip to torch/HF users of the
reference stack. Import(export(params)) is identity (tested).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import numpy as np

from plantcaduceus_tpu.models.config import CaduceusConfig


def export_state_dict(params, cfg: CaduceusConfig) -> Dict[str, np.ndarray]:
    """Framework pytree -> torch-convention state dict (numpy values).

    mamba1 follows the released Caduceus remote-code layout; the
    beyond-reference mamba2 (SSD) family follows mamba_ssm ``Mamba2``'s own
    packing (in_proj rows [z|x|B|C|dt], conv1d over [x|B|C], per-head
    dt_bias/A_log/D, gated norm) so exports read naturally to torch users
    of that stack."""
    blocks = {k: np.asarray(v, np.float32) for k, v in params["blocks"].items()}
    sd: Dict[str, np.ndarray] = {}
    emb_key = ("caduceus.backbone.embeddings.word_embeddings.embedding.weight"
               if cfg.rcps else
               "caduceus.backbone.embeddings.word_embeddings.weight")
    sd[emb_key] = np.asarray(params["embedding"], np.float32)

    G = cfg.n_directions
    if cfg.ssm_variant == "mamba2":
        for i in range(cfg.n_layer):
            base = f"caduceus.backbone.layers.{i}"
            norm_key = (f"{base}.norm.submodule.weight" if cfg.rcps
                        else f"{base}.norm.weight")
            sd[norm_key] = blocks["norm_weight"][i]
            for g in range(G):
                prefix = (f"{base}.mixer.submodule" if cfg.rcps
                          else f"{base}.mixer")
                m = (f"{prefix}.{'mamba_fwd' if g == 0 else 'mamba_rev'}"
                     if cfg.bidirectional else prefix)
                gio = min(g, blocks["in_proj_x"].shape[1] - 1)
                # mamba_ssm Mamba2 in_proj rows: [z | x | B | C | dt]
                sd[f"{m}.in_proj.weight"] = np.concatenate(
                    [blocks["in_proj_z"][i, gio].T,
                     blocks["in_proj_x"][i, gio].T,
                     blocks["in_proj_B"][i, g].T,
                     blocks["in_proj_C"][i, g].T,
                     blocks["in_proj_dt"][i, g].T], axis=0)
                # conv over the packed [x | B | C] stream
                cw = np.concatenate(
                    [blocks["conv_x_w"][i, g], blocks["conv_B_w"][i, g],
                     blocks["conv_C_w"][i, g]], axis=0)
                sd[f"{m}.conv1d.weight"] = cw[:, None, :]
                sd[f"{m}.conv1d.bias"] = np.concatenate(
                    [blocks["conv_x_b"][i, g], blocks["conv_B_b"][i, g],
                     blocks["conv_C_b"][i, g]], axis=0)
                gio_n = min(g, blocks["mixer_norm_weight"].shape[1] - 1)
                sd[f"{m}.norm.weight"] = blocks["mixer_norm_weight"][i, gio_n]
                gio_o = min(g, blocks["out_proj"].shape[1] - 1)
                sd[f"{m}.out_proj.weight"] = blocks["out_proj"][i, gio_o].T
                sd[f"{m}.dt_bias"] = blocks["dt_bias"][i, g]
                sd[f"{m}.A_log"] = blocks["A_log"][i, g]
                sd[f"{m}.D"] = blocks["D"][i, g]
        normf_key = ("caduceus.backbone.norm_f.submodule.weight" if cfg.rcps
                     else "caduceus.backbone.norm_f.weight")
        sd[normf_key] = np.asarray(params["norm_f_weight"], np.float32)
        if "lm_head" in params:
            sd["lm_head.lm_head.weight"] = np.asarray(params["lm_head"],
                                                      np.float32)
        return sd

    for i in range(cfg.n_layer):
        base = f"caduceus.backbone.layers.{i}"
        norm_key = (f"{base}.norm.submodule.weight" if cfg.rcps
                    else f"{base}.norm.weight")
        sd[norm_key] = blocks["norm_weight"][i]
        for g in range(G):
            prefix = (f"{base}.mixer.submodule" if cfg.rcps
                      else f"{base}.mixer")
            m = (f"{prefix}.{'mamba_fwd' if g == 0 else 'mamba_rev'}"
                 if cfg.bidirectional else prefix)
            gio = min(g, blocks["in_proj_x"].shape[1] - 1)
            # packed in_proj rows: [x | z], torch [2di, d]
            in_proj = np.concatenate(
                [blocks["in_proj_x"][i, gio].T, blocks["in_proj_z"][i, gio].T],
                axis=0)
            sd[f"{m}.in_proj.weight"] = in_proj
            gio_o = min(g, blocks["out_proj"].shape[1] - 1)
            sd[f"{m}.out_proj.weight"] = blocks["out_proj"][i, gio_o].T
            sd[f"{m}.conv1d.weight"] = blocks["conv_w"][i, g][:, None, :]
            sd[f"{m}.conv1d.bias"] = blocks["conv_b"][i, g]
            # packed x_proj rows: [dt | B | C], torch [R+2N, di]
            sd[f"{m}.x_proj.weight"] = np.concatenate(
                [blocks["x_proj_dt"][i, g].T, blocks["x_proj_B"][i, g].T,
                 blocks["x_proj_C"][i, g].T], axis=0)
            sd[f"{m}.dt_proj.weight"] = blocks["dt_proj_w"][i, g].T
            sd[f"{m}.dt_proj.bias"] = blocks["dt_proj_b"][i, g]
            sd[f"{m}.A_log"] = blocks["A_log"][i, g]
            sd[f"{m}.D"] = blocks["D"][i, g]

    normf_key = ("caduceus.backbone.norm_f.submodule.weight" if cfg.rcps
                 else "caduceus.backbone.norm_f.weight")
    sd[normf_key] = np.asarray(params["norm_f_weight"], np.float32)
    if "lm_head" in params:
        sd["lm_head.lm_head.weight"] = np.asarray(params["lm_head"], np.float32)
    return sd


def export_hf_dir(directory, params, cfg: CaduceusConfig) -> None:
    """Write config.json + pytorch_model.bin loadable by compat.hf_import
    (and structurally by the HF remote code)."""
    import torch

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    ssm_cfg = {"d_state": cfg.d_state, "d_conv": cfg.d_conv,
               "expand": cfg.expand}
    if cfg.ssm_variant == "mamba2":
        # mamba_ssm Mamba2 config naming for the SSD-specific dims
        ssm_cfg.update({"layer": "Mamba2", "headdim": cfg.head_dim,
                        "ngroups": cfg.n_groups,
                        "chunk_size": cfg.chunk_size})
    (directory / "config.json").write_text(json.dumps({
        "model_type": "caduceus",
        "d_model": cfg.d_model,
        "n_layer": cfg.n_layer,
        "vocab_size": cfg.vocab_size,
        "ssm_variant": cfg.ssm_variant,
        "ssm_cfg": ssm_cfg,
        "rcps": cfg.rcps,
        "bidirectional": cfg.bidirectional,
        "bidirectional_strategy": cfg.bidirectional_strategy,
        "bidirectional_weight_tie": cfg.bidirectional_weight_tie,
        "complement_map": {str(i): int(c)
                           for i, c in enumerate(cfg.complement_map)},
        "rms_norm": cfg.rms_norm,
        "norm_epsilon": cfg.norm_epsilon,
        "residual_in_fp32": cfg.residual_in_fp32,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "pad_token_id": cfg.pad_token_id,
    }, indent=2))
    sd = export_state_dict(params, cfg)
    # copy=True: jax-backed numpy views are read-only; from_numpy on a
    # non-writable array is undefined behavior (and warns).
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, directory / "pytorch_model.bin")
