"""Serving mode: HTTP scoring server + cross-request micro-batching.

Spins the real ThreadingHTTPServer on an ephemeral port with a tiny model
and checks (a) endpoint results match direct engine calls, (b) concurrent
requests are coalesced into fewer model invocations, (c) malformed input
fails the request without poisoning the batch or the server.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plantcaduceus_tpu.engine import zero_shot
from plantcaduceus_tpu.engine.client import ScoringClient
from plantcaduceus_tpu.engine.runner import InferenceRunner
from plantcaduceus_tpu.engine.server import (MicroBatcher, ScoringServer,
                                             ScoringService)
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.parallel import mesh as meshlib

TINY = dict(d_model=32, n_layer=2, vocab_size=16, d_state=8)
L = 128


@pytest.fixture(scope="module")
def service():
    cfg = CaduceusConfig(**TINY)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                             devices=jax.devices()[:1])
    runner = InferenceRunner(params, cfg, mesh=mesh, dtype=jnp.float32,
                             batch_size=8)
    return ScoringService(runner, DnaTokenizer())


@pytest.fixture(scope="module")
def server(service):
    srv = ScoringServer(service, port=0, model_name="tiny",
                        max_wait_ms=20.0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _seqs(rng, n):
    return ["".join(rng.choice(list("ACGT"), L)) for _ in range(n)]


def test_healthz_and_score_matches_engine(server, service, rng):
    client = ScoringClient(f"http://127.0.0.1:{server.port}")
    assert client.healthz() == {"status": "ok", "model": "tiny"}

    seqs = _seqs(rng, 5)
    refs = [s[L // 2 - 1] for s in seqs]
    alts = ["A" if r != "A" else "G" for r in refs]
    got = client.score(seqs, refs, alts)

    ids = zero_shot.mask_and_encode(seqs, service.tokenizer, L // 2 - 1)
    probs = service.runner.masked_probs(ids, service.nuc_ids, L // 2 - 1,
                                        progress=False)
    want = zero_shot.log_ratio_scores(probs, refs, alts)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_masked_probs_and_embed_endpoints(server, service, rng):
    client = ScoringClient(f"http://127.0.0.1:{server.port}")
    seqs = _seqs(rng, 3)

    probs = np.asarray(client.masked_probs(seqs, pos=17))
    want = service.masked_probs(seqs, pos=17)
    assert probs.shape == (3, 4)
    np.testing.assert_allclose(probs, want, rtol=1e-5, atol=1e-6)

    emb = np.asarray(client.embed(seqs))
    want = service.embed(seqs)
    assert emb.shape == want.shape  # [3, d_model] after RC-averaging
    np.testing.assert_allclose(emb, want, rtol=1e-5, atol=1e-6)


def test_concurrent_requests_are_coalesced(service, rng):
    """P parallel single-window requests must share forward passes."""
    calls = []
    orig = service.masked_probs

    def counting(seqs, pos=None):
        calls.append(len(seqs))
        return orig(seqs, pos)

    service.masked_probs = counting
    try:
        batcher = MicroBatcher(service, max_batch=64, max_wait_ms=50.0)
        seqs = _seqs(rng, 12)
        results = [None] * 12

        def one(i):
            results[i] = batcher.submit("masked_probs", sequences=[seqs[i]])

        threads = [threading.Thread(target=one, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batcher.shutdown()
    finally:
        service.masked_probs = orig

    # far fewer model calls than requests, all windows accounted for
    assert sum(calls) == 12 and len(calls) < 12
    want = orig(seqs)
    got = np.concatenate([np.asarray(r) for r in results])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bad_request_isolated(server, rng):
    """A non-SNP allele fails with 400; the server keeps serving."""
    import urllib.error

    client = ScoringClient(f"http://127.0.0.1:{server.port}")
    seqs = _seqs(rng, 1)
    with pytest.raises(urllib.error.HTTPError) as exc:
        client.score(seqs, ["N"], ["A"])
    assert exc.value.code == 400

    # server still healthy and scoring
    assert client.healthz()["status"] == "ok"
    out = client.score(seqs, [seqs[0][L // 2 - 1]], ["A"])
    assert np.isfinite(out).all()


def test_empty_sequences_rejected_without_killing_worker(server, rng):
    """POST with an empty sequences list must 400 — and must not crash the
    single MicroBatcher worker thread (which would hang every later
    request forever)."""
    import json
    import urllib.error
    import urllib.request

    url = f"http://127.0.0.1:{server.port}/masked_probs"
    for bad in ({"sequences": []}, {"sequences": [""]}, {}):
        req = urllib.request.Request(
            url, data=json.dumps(bad).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    # the worker is still alive: a well-formed request completes
    client = ScoringClient(f"http://127.0.0.1:{server.port}")
    seqs = _seqs(rng, 2)
    out = client.masked_probs(seqs)
    assert np.asarray(out).shape == (2, 4)


def test_string_and_ragged_sequences_rejected(server, rng):
    """'sequences' given as a JSON string (iterable of 1-char strs!) or as a
    ragged list must 400 at submit time, not be silently scored."""
    import json
    import urllib.error
    import urllib.request

    url = f"http://127.0.0.1:{server.port}/masked_probs"
    for bad in ({"sequences": "ACGT"},
                {"sequences": ["ACGT" * 8, "ACGT" * 4]}):
        req = urllib.request.Request(
            url, data=json.dumps(bad).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400


def test_mixed_window_lengths_cobatch_isolated(service, rng):
    """Requests with the same effective pos but different window lengths must
    land in separate sub-groups — both succeed instead of one ragged
    encode failing the whole group."""
    batcher = MicroBatcher(service, max_batch=64, max_wait_ms=50.0)
    try:
        short = ["".join(rng.choice(list("ACGT"), 64)) for _ in range(2)]
        long = _seqs(rng, 2)
        results: dict = {}

        def one(name, seqs, pos):
            try:
                results[name] = batcher.submit("masked_probs",
                                               sequences=seqs, pos=pos)
            except Exception as e:  # pragma: no cover - fail the assert below
                results[name] = e

        threads = [threading.Thread(target=one, args=("short", short, 10)),
                   threading.Thread(target=one, args=("long", long, 10))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        batcher.shutdown()

    for name, seqs in (("short", short), ("long", long)):
        assert not isinstance(results[name], Exception), results[name]
        np.testing.assert_allclose(np.asarray(results[name]),
                                   service.masked_probs(seqs, pos=10),
                                   rtol=1e-5, atol=1e-6)
