"""CLI: persistent scoring server (serving mode).

Compiles the model once and then serves variant scores / masked-nucleotide
probabilities / RC-averaged embeddings over a JSON HTTP API, with
cross-request micro-batching (engine/server.py). The reference has no
serving mode — each src/zero_shot_score.py run pays model load + compile.

Usage:
    python -m plantcaduceus_tpu.cli.serve -model l20 [-port 8142] \
        [-batchSize 128] [-maxWaitMs 5] [-warmup]

API (see engine/server.py for schemas):
    GET  /healthz
    POST /score         {"items": [{"sequence","ref","alt"}, ...]}
    POST /masked_probs  {"sequences": [...], "pos": 255?}
    POST /embed         {"sequences": [...]}
"""

from __future__ import annotations

import argparse
import logging
import sys

import jax.numpy as jnp

from plantcaduceus_tpu.engine.runner import InferenceRunner
from plantcaduceus_tpu.engine.server import ScoringServer, ScoringService
from plantcaduceus_tpu.parallel import mesh as meshlib
from plantcaduceus_tpu.utils.model_loading import load_model_and_tokenizer
from plantcaduceus_tpu.utils.platform import maybe_force_platform


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-model", dest="model", required=True,
                   help="HF checkpoint dir or preset (l20/l24/l28/l32)")
    p.add_argument("-host", dest="host", default="127.0.0.1")
    p.add_argument("-port", dest="port", type=int, default=8142)
    p.add_argument("-batchSize", dest="batch_size", type=int, default=128)
    p.add_argument("-maxBatch", dest="max_batch", type=int, default=1024,
                   help="coalescing cap across concurrent requests")
    p.add_argument("-maxWaitMs", dest="max_wait_ms", type=float, default=5.0)
    p.add_argument("-tokenIdx", dest="token_idx", type=int, default=None,
                   help="default mask position (default: center of window)")
    p.add_argument("-seq", dest="seq", type=int, default=1,
                   help="context-parallel mesh shards over the window length")
    p.add_argument("-dtype", dest="dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("-warmup", action="store_true",
                   help="compile the forward before accepting requests")
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(
        force=True,
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    args = parse_args(argv)
    maybe_force_platform()
    meshlib.initialize_distributed()

    params, cfg, tokenizer = load_model_and_tokenizer(args.model)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(seq=args.seq)) \
        if args.seq > 1 else None
    runner = InferenceRunner(
        params, cfg, mesh=mesh,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        batch_size=args.batch_size,
    )
    service = ScoringService(runner, tokenizer, default_pos=args.token_idx)

    if args.warmup:
        import numpy as np
        logging.info("Warmup: compiling the scoring forward ...")
        probs = service.masked_probs(["A" * 512] * args.batch_size)
        assert np.isfinite(probs).all()
        logging.info("Warmup done")

    server = ScoringServer(service, host=args.host, port=args.port,
                           model_name=args.model, max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms)
    logging.info("Scoring server listening on http://%s:%d", args.host,
                 server.port)
    server.serve_forever()


if __name__ == "__main__":
    sys.exit(main())
