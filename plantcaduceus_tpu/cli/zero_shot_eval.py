"""CLI: PlantCAD2 zero-shot evaluation suite (src/zero-shot-eval.py).

Subcommands: evo_cons | motif_acc | sv_effect | core_noncore.
Datasets: ``--repo-id`` accepts an HF dataset id/config (``repo`` +
``--task`` config) or a local TSV/parquet path (offline parity). Logit
caching via --save-logits / --logits-path, metrics to --metrics-json —
the same knobs as the reference. Runs on TPU by default (the reference is
GPU-mandatory; here any backend works, PCAD_PLATFORM=cpu for CPU).

Example:
  python -m plantcaduceus_tpu.cli.zero_shot_eval evo_cons \
      --repo-id data.tsv --model <ckpt|preset> --token-idx 255
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

log = logging.getLogger(__name__)


def _load_frame(repo_id: str, task: str, split: str):
    import pandas as pd
    from pathlib import Path

    p = Path(repo_id)
    if p.exists():
        if p.suffix == ".parquet":
            return pd.read_parquet(p)
        return pd.read_csv(p, sep="\t")
    import datasets

    ds = datasets.load_dataset(repo_id, task)
    return ds[split].to_pandas()


def _runner(args):
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.parallel import mesh as meshlib
    from plantcaduceus_tpu.utils.model_loading import load_model_and_tokenizer

    params, cfg, tok = load_model_and_tokenizer(args.model)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(seq=args.seq)) \
        if getattr(args, "seq", 1) > 1 else None
    runner = InferenceRunner(params, cfg, mesh=mesh, dtype=jnp.bfloat16,
                             batch_size=args.batch_size)
    from plantcaduceus_tpu.io.tokenizer import nucleotide_ids

    nuc_ids = nucleotide_ids(tok)
    return runner, tok, nuc_ids


def _masked_probs(args, sequences, positions):
    if args.logits_path:
        import pandas as pd

        return pd.read_csv(args.logits_path, sep="\t").values
    runner, tok, nuc_ids = _runner(args)
    ids = tok.encode_batch([str(s) for s in sequences])
    ids[:, list(positions)] = tok.mask_token_id
    probs = runner.multi_masked_probs(ids, nuc_ids, positions,
                                      progress=not args.no_progress)
    if args.save_logits:
        import pandas as pd

        pd.DataFrame(probs, columns=list("ACGT")).to_csv(
            args.save_logits, sep="\t", index=False)
        log.info("Saved logits TSV to %s", args.save_logits)
    return probs


def _emit(metrics: dict, args):
    for k, v in metrics.items():
        print(f"{k}\t{v:.6f}")
    if args.metrics_json:
        with open(args.metrics_json, "w") as f:
            json.dump(metrics, f, indent=2)


def cmd_evo_cons(args):
    from plantcaduceus_tpu.engine import eval_tasks as T

    df = _load_frame(args.repo_id, args.task, args.split)
    probs = _masked_probs(args, df[args.seq_column], [args.token_idx])
    assert probs.shape[0] == len(df), \
        f"Row mismatch: probs={probs.shape[0]} examples={len(df)}"
    scores = T.refprob_scores(df[args.seq_column].tolist(), probs,
                              args.token_idx)
    y = df["label"].astype(int).to_numpy()
    m = T.auroc_auprc(y, scores)
    m["token_idx"] = args.token_idx
    _emit({"AUROC": m["auroc"], "AUPRC": m["auprc"]}, args)
    if args.metrics_json:
        with open(args.metrics_json, "w") as f:
            json.dump(m, f, indent=2)


def cmd_motif_acc(args):
    from plantcaduceus_tpu.engine import eval_tasks as T

    df = _load_frame(args.repo_id, args.task, args.split)
    positions = [int(x) for x in args.mask_idx.split(",")]
    assert len(positions) == args.motif_len, \
        "mask_idx count must equal motif_len"
    probs = _masked_probs(args, df[args.seq_column], positions)
    expected = len(df) * len(positions)
    assert probs.shape[0] == expected, \
        f"Row mismatch: probs={probs.shape[0]} expected={expected}"
    true_tokens = T.true_tokens_from_seq(df[args.seq_column], positions)
    _emit({"token_accuracy": T.token_accuracy(probs, true_tokens),
           "motif_accuracy": T.motif_accuracy(probs, true_tokens,
                                              args.motif_len)}, args)


def cmd_core_noncore(args):
    from plantcaduceus_tpu.engine import eval_tasks as T

    df = _load_frame(args.repo_id, args.task, args.split)
    positions = [int(x) for x in args.mask_idx.split(",")]
    assert len(positions) == args.motif_len
    probs = _masked_probs(args, df[args.seq_column], positions)
    expected = len(df) * len(positions)
    assert probs.shape[0] == expected
    true_tokens = T.true_tokens_from_seq(df[args.seq_column], positions)
    scores = T.avg_trueprob_scores(probs, true_tokens, args.motif_len)
    y = df[args.label_column].astype(int).to_numpy()
    m = T.auroc_auprc(y, scores)
    _emit({"AUROC": m["auroc"], "AUPRC": m["auprc"]}, args)


def cmd_sv_effect(args):
    from plantcaduceus_tpu.engine import eval_tasks as T

    df = _load_frame(args.repo_id, args.task, args.split)
    required = ["RefSeq", "MutSeq", "left", "right", "label"]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise KeyError(f"Missing required columns: {missing}")

    runner, tok, nuc_ids = _runner(args)
    ref_probs = runner.positionwise_probs(
        tok.encode_batch(df["RefSeq"].astype(str).tolist()), nuc_ids,
        progress=not args.no_progress)
    mut_probs = runner.positionwise_probs(
        tok.encode_batch(df["MutSeq"].astype(str).tolist()), nuc_ids,
        progress=not args.no_progress)
    if args.save_ref_logits:
        np.savez_compressed(args.save_ref_logits, logits=ref_probs)
    if args.save_mut_logits:
        np.savez_compressed(args.save_mut_logits, logits=mut_probs)

    rows = df.to_dict("records")
    scores = T.sv_llr_boundary(rows, ref_probs, mut_probs, args.flanking)
    y = df["label"].astype(int).to_numpy()
    from sklearn.metrics import average_precision_score

    _emit({"AUPRC": float(average_precision_score(y, scores))}, args)
    if args.output:
        out = df.copy()
        out["score"] = scores
        out = out.drop(columns=["Left5_Positions", "Right5_Positions"],
                       errors="ignore")
        out.to_csv(args.output, sep="\t", index=False)


def main(argv=None):
    logging.basicConfig(force=True, level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--repo-id", required=True)
        sp.add_argument("--task", default=None)
        sp.add_argument("--split", default="valid")
        sp.add_argument("--model", default="pc2-small")
        sp.add_argument("--batch-size", type=int, default=128)
        sp.add_argument("--seq-column", default="sequence")
        sp.add_argument("--save-logits", default=None)
        sp.add_argument("--logits-path", default=None)
        sp.add_argument("--metrics-json", default=None)
        sp.add_argument("--seq", type=int, default=1,
                        help="context-parallel mesh shards over the "
                             "window length (8192-bp latency)")
        sp.add_argument("--no-progress", action="store_true")

    ec = sub.add_parser("evo_cons")
    common(ec)
    ec.add_argument("--token-idx", type=int, default=255)
    ec.set_defaults(fn=cmd_evo_cons)

    ma = sub.add_parser("motif_acc")
    common(ma)
    ma.add_argument("--mask-idx", default="255,256,257")
    ma.add_argument("--motif-len", type=int, default=3)
    ma.set_defaults(fn=cmd_motif_acc)

    cn = sub.add_parser("core_noncore")
    common(cn)
    cn.add_argument("--mask-idx", default="255,256,257")
    cn.add_argument("--motif-len", type=int, default=3)
    cn.add_argument("--label-column", default="label")
    cn.set_defaults(fn=cmd_core_noncore)

    sv = sub.add_parser("sv_effect")
    common(sv)
    sv.add_argument("--flanking", type=int, default=5)
    sv.add_argument("--output", default=None)
    sv.add_argument("--save-ref-logits", default=None)
    sv.add_argument("--save-mut-logits", default=None)
    sv.set_defaults(fn=cmd_sv_effect)

    args = p.parse_args(argv)

    from plantcaduceus_tpu.utils.platform import maybe_force_platform

    maybe_force_platform()
    args.fn(args)


if __name__ == "__main__":
    main()
