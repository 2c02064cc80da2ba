"""Independent NumPy fp64 golden model of the Caduceus/Mamba math.

Written as a direct, naive transcription of the published architecture
(nested loops, explicit flips/concats, one stream at a time) so that the
optimised stream-folded JAX implementation is validated against a program
with a completely different structure. Everything is float64.

Semantics being modelled (see SURVEY.md §2.2):
  * Mamba mixer: in_proj -> causal depthwise conv(K) -> SiLU -> x_proj ->
    dt_proj -> softplus -> selective scan -> gate -> out_proj.
  * BiMamba: fwd mamba + time-reversed mamba with tied in/out projections,
    outputs added.
  * RCPS: shared-weight block applied to the forward stream and to the
    flip_LC-transformed RC stream; stored hidden = [fwd ‖ flip_LC(rc_out)].
  * RCPS LM head: W·h_fwd + W[comp]·flip_C(h_rc_stored), summed.
"""

import numpy as np


def softplus(x):
    return np.logaddexp(0.0, x)


def silu(x):
    return x / (1.0 + np.exp(-x))


def rms_norm(x, w, eps=1e-5):
    var = np.mean(x * x, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


def selective_scan_ref(x, dt_raw, A, B, C, D, dt_bias):
    """Naive per-step recurrence. x, dt_raw: [L, d_in]; A: [d_in, N];
    B, C: [L, N]; D: [d_in]; dt_bias: [d_in]. Returns y: [L, d_in]."""
    L, d_in = x.shape
    N = A.shape[1]
    dt = softplus(dt_raw + dt_bias)
    h = np.zeros((d_in, N))
    y = np.zeros((L, d_in))
    for t in range(L):
        a = np.exp(dt[t][:, None] * A)                    # [d_in, N]
        h = a * h + (dt[t] * x[t])[:, None] * B[t][None]  # [d_in, N]
        y[t] = h @ C[t] + D * x[t]
    return y


def causal_conv_ref(x, w, b):
    """x: [L, d], w: [d, K] (tap K-1 = current step), b: [d]."""
    L, d = x.shape
    K = w.shape[1]
    xp = np.concatenate([np.zeros((K - 1, d)), x], axis=0)
    y = np.zeros((L, d))
    for t in range(L):
        for k in range(K):
            y[t] += xp[t + k] * w[:, k]
    return y + b


def mamba_ref(x, p, g):
    """Single-direction Mamba on x: [L, d]. p: per-layer param dict (numpy,
    same layout as the JAX model), g: direction index."""
    gio = min(g, p["in_proj_x"].shape[0] - 1)
    xi = x @ p["in_proj_x"][gio]                  # [L, di]
    z = x @ p["in_proj_z"][gio]
    xi = silu(causal_conv_ref(xi, p["conv_w"][g], p["conv_b"][g]))
    dt_lr = xi @ p["x_proj_dt"][g]
    B = xi @ p["x_proj_B"][g]
    C = xi @ p["x_proj_C"][g]
    dt_raw = dt_lr @ p["dt_proj_w"][g]
    y = selective_scan_ref(xi, dt_raw, -np.exp(p["A_log"][g]), B, C,
                           p["D"][g], p["dt_proj_b"][g])
    y = y * silu(z)
    gio_o = min(g, p["out_proj"].shape[0] - 1)
    return y @ p["out_proj"][gio_o]


def bimamba_ref(x, p, bidirectional=True, strategy="add"):
    out = mamba_ref(x, p, 0)
    if bidirectional:
        rev = mamba_ref(x[::-1], p, 1)[::-1]
        out = out + rev if strategy == "add" else out * rev
    return out


def flip_lc(h):
    """Flip length and channel axes — the RCPS frame transform."""
    return h[::-1, ::-1]


def rcps_block_ref(h, p, cfg):
    """One RCPS layer on stored-frame hidden h: [L, 2d]. Returns [L, 2d]."""
    d = h.shape[1] // 2
    fwd = bimamba_ref(h[:, :d], p, cfg.bidirectional, cfg.bidirectional_strategy)
    rc = bimamba_ref(flip_lc(h[:, d:]), p, cfg.bidirectional, cfg.bidirectional_strategy)
    return np.concatenate([fwd, flip_lc(rc)], axis=1)


def rcps_norm_ref(h, w, eps):
    """Shared-weight RMSNorm applied per RCPS half (channel-flip for rc)."""
    d = h.shape[1] // 2
    fwd = rms_norm(h[:, :d], w, eps)
    rc = rms_norm(h[:, d:][:, ::-1], w, eps)[:, ::-1]
    return np.concatenate([fwd, rc], axis=1)


def caduceus_forward_ref(ids, params, cfg):
    """Full golden forward for one sequence. ids: [L] ints.
    Returns (logits [L, V], hidden [L, 2d])."""
    cmap = np.asarray(cfg.complement_map)
    emb = np.asarray(params["embedding"], np.float64)
    rc_ids = cmap[ids][::-1]

    fwd_emb = emb[ids]                      # [L, d]
    rc_emb = flip_lc(emb[rc_ids])           # stored frame
    h = np.concatenate([fwd_emb, rc_emb], axis=1)  # [L, 2d]

    blocks = {k: np.asarray(v, np.float64) for k, v in params["blocks"].items()}
    n_layer = blocks["norm_weight"].shape[0]
    residual = h
    for l in range(n_layer):
        p = {k: v[l] for k, v in blocks.items()}
        normed = rcps_norm_ref(residual, p["norm_weight"], cfg.norm_epsilon)
        out = rcps_block_ref(normed, p, cfg)
        residual = residual + out
    hidden = rcps_norm_ref(residual, np.asarray(params["norm_f_weight"], np.float64),
                           cfg.norm_epsilon)

    W = np.asarray(params.get("lm_head", params["embedding"]), np.float64)
    d = hidden.shape[1] // 2
    fwd_logits = hidden[:, :d] @ W.T
    rc_logits = hidden[:, d:][:, ::-1] @ W[cmap].T
    logits = fwd_logits + rc_logits
    if cfg.lm_head_strategy == "mean":
        logits = logits * 0.5
    return logits, hidden
