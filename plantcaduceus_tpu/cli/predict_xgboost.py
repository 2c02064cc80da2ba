"""CLI: predict with a pre-trained XGBoost classifier over embeddings
(the reference's src/predict_XGBoost.py).

Loads a classifier JSON (e.g. the released
classifiers/PlantCaduceus_l{20..32}/{TIS,TTS,Donor,Acceptor}_XGBoost.json
artifacts), extracts RC-averaged center embeddings for the input TSV's
``sequences`` column, and writes ``label\tprediction`` TSV.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

log = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-input", dest="input", required=True,
                   help="TSV with a 'sequences' column (and optional 'label')")
    p.add_argument("-model", dest="model", required=True,
                   help="Caduceus checkpoint dir or preset")
    p.add_argument("-classifier", dest="classifier", required=True,
                   help="XGBoost classifier JSON")
    p.add_argument("-output", dest="output", required=True)
    p.add_argument("-batchSize", dest="batch_size", type=int, default=128)
    p.add_argument("-tokenIdx", dest="token_idx", type=int, default=255)
    p.add_argument("-no-progress", action="store_true", dest="no_progress")
    return p.parse_args(argv)


def main(argv=None):
    import pandas as pd
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.utils.model_loading import load_model_and_tokenizer
    from plantcaduceus_tpu.utils.platform import maybe_force_platform

    logging.basicConfig(force=True, level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s",
                        datefmt="%Y-%m-%d %H:%M:%S")
    args = parse_args(argv)
    maybe_force_platform()

    df = pd.read_csv(args.input, sep="\t")
    params, cfg, tok = load_model_and_tokenizer(args.model)
    runner = InferenceRunner(params, cfg, dtype=jnp.bfloat16,
                             batch_size=args.batch_size)
    ids = tok.encode_batch(df["sequences"].astype(str).tolist())
    emb = runner.center_embeddings(ids, args.token_idx,
                                   progress=not args.no_progress)

    from plantcaduceus_tpu.downstream.gbm import GbmClassifier

    clf = GbmClassifier.load(args.classifier)
    preds = clf.predict_proba(emb)[:, 1]

    out = pd.DataFrame({
        "label": df["label"] if "label" in df.columns else np.zeros(len(df), int),
        "prediction": preds,
    })
    out.to_csv(args.output, sep="\t", index=False)
    log.info("Wrote %d predictions to %s", len(out), args.output)


if __name__ == "__main__":
    main()
