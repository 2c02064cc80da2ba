"""Planted-structure convergence check: proof the pre-train recipe LEARNS.

The reference's recipe demonstrably trained the released models
(/root/reference/src/HF_pre_train.py:479-516; README 120k-step command).
The rest of this framework's suite proves the trainer *descends* and
*resumes*; an optimizer-wiring or masking-semantics bug that still descends
would pass all of it. This module closes that hole with a corpus whose
structure is known by construction:

* a fixed UPPERCASE motif embedded at random positions in iid background —
  after training, masked positions inside the motif must be predicted far
  above chance while background positions stay at chance;
* a LOWERCASE tandem-repeat tract (soft-masked, the genome's repeat-masker
  convention) whose content is also predictable — the soft-mask loss weight
  (HF_pre_train.py:424-437: 0.1 train) must measurably modulate how fast
  that region is learned relative to weight 1.0.

Driven end-to-end through the REAL pipeline — PretrainDataset (lowercase ->
loss_weights), MlmCollator (15% dynamic masking), make_train_step (weighted
CE) — so it fails if any of that wiring stops learning, not just stops
descending. Used by tests/test_pretrain_learns.py (CPU) and bench.py's
convergence lane (TPU, anchored).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MOTIF = "GATTACAG"          # planted uppercase motif
REPEAT_UNIT = "acggta"      # lowercase tandem-repeat unit (soft-masked)
REPEAT_SPAN = (100, 124)    # repeat tract [start, end) within each window


def planted_corpus(n: int, window: int = 128, seed: int = 0,
                   motifs_per_seq: int = 2) -> List[str]:
    """Sequences of iid ACGT background + ``motifs_per_seq`` planted copies
    of MOTIF (uppercase, outside the repeat tract) + one lowercase tandem
    REPEAT_UNIT tract at REPEAT_SPAN (phase-locked, so its content is
    predictable from position context alone)."""
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    rs, re = REPEAT_SPAN
    assert re <= window and rs > motifs_per_seq * (len(MOTIF) + 2)
    out = []
    repeat = (REPEAT_UNIT * ((re - rs) // len(REPEAT_UNIT) + 1))[: re - rs]
    for _ in range(n):
        s = list(rng.choice(bases, window))
        # non-overlapping motif sites in [0, rs - len(MOTIF))
        starts: List[int] = []
        while len(starts) < motifs_per_seq:
            c = int(rng.integers(0, rs - len(MOTIF)))
            if all(abs(c - p) >= len(MOTIF) for p in starts):
                starts.append(c)
        for c in starts:
            s[c : c + len(MOTIF)] = list(MOTIF)
        s[rs:re] = list(repeat)
        out.append("".join(s))
    return out


def motif_starts(seq: str) -> List[int]:
    out, i = [], seq.find(MOTIF)
    while i != -1:
        out.append(i)
        i = seq.find(MOTIF, i + 1)
    return out


def train_planted(cfg, steps: int, batch: int = 16, window: int = 128,
                  soft_masked_weight: float = 0.1, seed: int = 0,
                  n_corpus: int = 1024, dtype=None, lr: float = 3e-3,
                  mesh=None, loss_every: int = 25) -> Dict:
    """Pre-train ``cfg`` on the planted corpus through the real pipeline.

    Returns {"losses": [(step, loss), ...], "final_loss": float,
    "state": TrainState, "corpus": [...]} — callers evaluate structure
    learning with :func:`evaluate_structure`.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.parallel import mesh as meshlib
    from plantcaduceus_tpu.train import step as step_lib
    from plantcaduceus_tpu.train.data import PretrainDataset

    if dtype is None:
        dtype = jnp.float32
    corpus = planted_corpus(n_corpus, window, seed=seed + 100)
    tok = DnaTokenizer()
    data = PretrainDataset(corpus, tok, batch,
                           soft_masked_weight=soft_masked_weight, seed=seed)
    params = caduceus.init_params(jax.random.PRNGKey(seed), cfg)
    if mesh is None:
        mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                                 devices=jax.devices()[:1])
    opt = optax.adamw(optax.warmup_constant_schedule(0.0, lr, 20))
    init_state, train_step, _ = step_lib.make_train_step(
        cfg, opt, mesh, params, dtype=dtype, remat=False)
    state = init_state(params)

    losses: List[Tuple[int, float]] = []
    for step, batch_np in zip(range(steps), data):
        bd = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, m = train_step(state, bd)
        if (step + 1) % loss_every == 0 or step == steps - 1:
            losses.append((step + 1, float(m["loss"])))
    return {"losses": losses, "final_loss": losses[-1][1], "state": state,
            "corpus": corpus, "tokenizer": tok, "mesh": mesh, "cfg": cfg,
            "dtype": dtype, "seed": seed}


def evaluate_structure(run: Dict, n_eval: int = 128,
                       seed: int = 1, held_out: bool = True) -> Dict[str, float]:
    """Probe what the trained model knows, with single-position masking:

    * motif_accuracy     — masked base INSIDE a planted motif (predictable
                           from the visible rest of the motif)
    * background_accuracy — masked iid background base (chance = 0.25)
    * repeat_loss        — mean NLL of masked bases inside the lowercase
                           tandem tract (predictable; how LOW it is measures
                           how much the soft-mask weight let it be learned)

    ``held_out=True`` (default) probes FRESH sequences from the same
    generator with a disjoint seed — sequences never trained on — so motif
    accuracy asserts generalization of the planted rule, not recall of the
    training corpus (VERDICT r4 #6). The background-at-chance check stays
    either way as the gross-memorization bound.
    """
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.io.tokenizer import nucleotide_ids

    cfg, tok = run["cfg"], run["tokenizer"]
    params = run["state"].params
    rng = np.random.default_rng(seed)
    if held_out:
        window = len(run["corpus"][0])
        # train_planted draws the corpus at seed+100; +987654 is disjoint
        # for any sane caller seed.
        corpus = planted_corpus(n_eval, window,
                                seed=run.get("seed", 0) + 987654)
    else:
        corpus = run["corpus"][:n_eval]
    rs, re = REPEAT_SPAN

    nuc = nucleotide_ids(tok)
    rows, pos, true_b, kind = [], [], [], []
    for s in corpus:
        ms = motif_starts(s)
        if not ms:
            continue
        # motif-interior position (>= 2 in, so context identifies it)
        c = ms[int(rng.integers(len(ms)))]
        j = c + int(rng.integers(2, len(MOTIF)))
        rows.append(s), pos.append(j), true_b.append(s[j]), kind.append("m")
        # background position away from motifs and the repeat tract
        while True:
            j = int(rng.integers(0, rs))
            if all(not (m <= j < m + len(MOTIF)) for m in ms):
                break
        rows.append(s), pos.append(j), true_b.append(s[j]), kind.append("b")
        # repeat-tract position (leave the unit's phase inferable)
        j = int(rng.integers(rs + len(REPEAT_UNIT), re))
        rows.append(s), pos.append(j), true_b.append(s[j].upper()), \
            kind.append("r")

    ids = tok.encode_batch(rows)
    ids[np.arange(len(pos)), pos] = tok.mask_token_id

    @jax.jit
    def fwd(p, ids_):
        out = caduceus.forward(p, ids_, cfg, dtype=run["dtype"])
        return out["logits"].astype(jnp.float32)

    logits = np.asarray(fwd(params, jnp.asarray(ids)))
    at = logits[np.arange(len(pos)), pos][:, nuc]     # [n, 4] ACGT order
    pred = np.asarray(list("ACGT"))[at.argmax(axis=1)]
    mx = at.max(1, keepdims=True)
    logp = at - mx - np.log(np.exp(at - mx).sum(1, keepdims=True))
    tidx = np.array(["ACGT".index(b) for b in true_b])
    nll = -logp[np.arange(len(tidx)), tidx]

    kind = np.array(kind)
    true_arr = np.array(true_b)
    res = {"held_out": held_out}
    for k, name in (("m", "motif"), ("b", "background"), ("r", "repeat")):
        sel = kind == k
        res[f"{name}_accuracy"] = float((pred[sel] == true_arr[sel]).mean())
        res[f"{name}_loss"] = float(nll[sel].mean())
    return res
