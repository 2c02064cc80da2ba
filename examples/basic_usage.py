"""Basic usage walkthrough — the notebooks/examples.ipynb analogue.

Mirrors the reference tutorial flow (load model → tokenize a 512-mer →
embeddings with RC averaging → masked prediction at position 255) against
this framework's API. Runs on CPU with a random l20 unless you point
MODEL at a checkpoint.

    PCAD_PLATFORM=cpu python examples/basic_usage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL = os.environ.get("MODEL", "l20")


def main():
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.utils.model_loading import load_model_and_tokenizer
    from plantcaduceus_tpu.utils.platform import maybe_force_platform

    maybe_force_platform()

    # 1. Load model + tokenizer (preset name or checkpoint directory).
    params, cfg, tokenizer = load_model_and_tokenizer(MODEL)
    print(f"model: d_model={cfg.d_model} n_layer={cfg.n_layer} "
          f"rcps={cfg.rcps} vocab={cfg.vocab_size}")

    # 2. Tokenize a 512-bp window: one id per base, no special tokens.
    rng = np.random.default_rng(0)
    sequence = "".join(rng.choice(list("ACGT"), 512))
    ids = tokenizer.encode_batch([sequence])
    assert ids.shape == (1, 512)

    runner = InferenceRunner(params, cfg, dtype=jnp.float32, batch_size=1)

    # 3. RC-averaged embedding of the centre base (the XGBoost feature
    #    contract: channels split in half, second half reversed, averaged).
    emb = runner.center_embeddings(ids, position=255, progress=False)
    print(f"embedding: shape={emb.shape} (d_model={cfg.d_model})")

    # 4. Masked prediction at position 255.
    masked = ids.copy()
    masked[0, 255] = tokenizer.mask_token_id
    vocab = tokenizer.get_vocab()
    probs = runner.masked_probs(masked, [vocab[n] for n in "acgt"], 255,
                                progress=False)
    print("P(A,C,G,T) at centre:", np.round(probs[0], 4),
          "| true base:", sequence[255])

    # 5. Zero-shot score of a substitution: log(P_alt / P_ref).
    ref, alt = sequence[255], ("A" if sequence[255] != "A" else "C")
    nuc = "ACGT"
    score = float(np.log(probs[0, nuc.index(alt)] / probs[0, nuc.index(ref)]))
    print(f"zero-shot score {ref}->{alt}: {score:.4f}")


if __name__ == "__main__":
    main()
