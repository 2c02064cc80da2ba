"""Multi-host scoring path (engine/zero_shot.py process_count > 1 branch).

A real pod can't run in CI, so this exercises the branch three ways:
pure-numpy tests of ``_unstripe`` and the equal-shape pad/count math, and a
full simulation of ``nucleotide_probs`` under a faked ``process_count`` —
each simulated host runs the branch for real (striping, padding, its own
``masked_probs`` shard) with ``process_allgather`` stubbed to assemble the
hosts' contributions — asserting the globally-ordered result equals the
single-process answer. Covers the fewer-records-than-hosts branch too.
Mirrors SURVEY.md §2.7's record-striding + all_gather plan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plantcaduceus_tpu.engine import zero_shot
from plantcaduceus_tpu.engine.runner import InferenceRunner
from plantcaduceus_tpu.engine.zero_shot import _unstripe
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.parallel import mesh as meshlib

TINY = dict(d_model=32, n_layer=2, vocab_size=16, d_state=8)


# ---------------------------------------------------------------------------
# _unstripe as a pure function
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("total,n_hosts", [(12, 3), (13, 3), (14, 3),
                                           (7, 4), (2, 4), (1, 8)])
def test_unstripe_roundtrip(total, n_hosts):
    glob = np.arange(total * 4, dtype=np.float32).reshape(total, 4)
    counts = [len(range(h, total, n_hosts)) for h in range(n_hosts)]
    per = -(-total // n_hosts)  # ceil: the padded per-host row count
    gathered = np.zeros((n_hosts, per, 4), np.float32)
    for h in range(n_hosts):
        mine = glob[h::n_hosts]
        gathered[h, : len(mine)] = mine  # rows past counts[h] stay garbage-0
    out = _unstripe(gathered, counts)
    np.testing.assert_array_equal(out, glob)


def test_unstripe_ignores_pad_rows():
    """Padding rows beyond counts[h] must never leak into the output."""
    glob = np.arange(10, dtype=np.float32).reshape(5, 2)
    n = 2
    counts = [3, 2]
    gathered = np.full((n, 3, 2), np.nan, np.float32)
    for h in range(n):
        mine = glob[h::n]
        gathered[h, : len(mine)] = mine
    out = _unstripe(gathered, counts)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out, glob)


def test_pad_count_math_matches_branch():
    """The branch pads every host to per = ceil(N / n_hosts); check the
    invariant that stripes + pad always produce equal shapes and that the
    zero-record host contributes an all-pad shard."""
    for total in (0, 1, 2, 5, 9):
        n = 4
        per = -(-total // n) if total else 0
        seqs = list(range(total))
        for h in range(n):
            mine = seqs[h::n]
            assert len(mine) <= max(per, 0)
            pad = per - len(mine)
            assert pad >= 0
            if total and total < n and h >= total:
                assert len(mine) == 0 and pad == per


# ---------------------------------------------------------------------------
# nucleotide_probs multi-host branch, simulated end-to-end
# ---------------------------------------------------------------------------


def _setup(rng, n, L=64):
    cfg = CaduceusConfig(**TINY)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    tok = DnaTokenizer()
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                             devices=jax.devices()[:1])
    runner = InferenceRunner(params, cfg, mesh=mesh, dtype=jnp.float32,
                             batch_size=8)
    seqs = ["".join(rng.choice(list("ACGT"), L)) for _ in range(n)]
    return runner, tok, seqs


def _run_simulated(monkeypatch, runner, tok, seqs, n_hosts, token_idx=32):
    """Run the real process_count>1 branch once per simulated host,
    stubbing only process_allgather (phase 1 records each host's local
    shard; phase 2 replays the assembled gather to every host)."""
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: n_hosts)
    locals_ = {}

    def capture(local):
        locals_[jax.process_index()] = np.asarray(local)
        per = max(a.shape[0] for a in locals_.values()) if locals_ else 0
        return np.zeros((n_hosts, per) + np.asarray(local).shape[1:],
                        np.float32)

    monkeypatch.setattr(multihost_utils, "process_allgather", capture)
    for h in range(n_hosts):
        monkeypatch.setattr(jax, "process_index", lambda h=h: h)
        zero_shot.nucleotide_probs(runner, tok, seqs, token_idx,
                                   progress=False)

    shapes = {a.shape for a in locals_.values()}
    assert len(shapes) == 1, f"hosts contributed unequal shapes: {shapes}"
    gathered = np.stack([locals_[h] for h in range(n_hosts)])
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda local: gathered)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    return zero_shot.nucleotide_probs(runner, tok, seqs, token_idx,
                                      progress=False)


@pytest.mark.parametrize("n_records,n_hosts", [(11, 3), (12, 3), (2, 4)])
def test_multihost_matches_single_process(rng, monkeypatch, n_records,
                                          n_hosts):
    runner, tok, seqs = _setup(rng, n_records)
    want = zero_shot.nucleotide_probs(runner, tok, seqs, token_idx=32,
                                      progress=False)
    got = _run_simulated(monkeypatch, runner, tok, seqs, n_hosts)
    assert got.shape == (n_records, 4)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_multihost_with_duplicate_windows(rng, monkeypatch):
    """Dedup runs before striping; the gathered uniques must re-expand to
    per-record order identically to the single-process path."""
    runner, tok, seqs = _setup(rng, 6)
    seqs = seqs + seqs[:3] + [seqs[0]]
    want = zero_shot.nucleotide_probs(runner, tok, seqs, token_idx=32,
                                      progress=False)
    got = _run_simulated(monkeypatch, runner, tok, seqs, n_hosts=3)
    assert got.shape == (len(seqs), 4)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got[0], got[-1], rtol=0, atol=0)
