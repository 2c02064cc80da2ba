"""CLI: distill a Caduceus teacher into a (typically faster) student.

Beyond-reference capability (the reference has no distillation anywhere):
the intended use is migrating a pretrained Mamba-1 checkpoint onto the SSD
(`-ssd`) family — 1.4-2x the zero-shot throughput at equal size
(docs/DESIGN.md §7) — or compressing to a smaller config. Usage:

    python -m plantcaduceus_tpu.cli.distill \
        --teacher /path/to/hf_or_export_dir \
        --student-preset l20-ssd \
        --dataset genome.fa --window 512 \
        --batch-size 32 --max-steps 20000 --output-dir runs/l20_to_ssd

The objective is masked-LM distillation (train/distill.py): soft-target KL
at temperature --temperature mixed with the hard MLM loss by --alpha, same
masking/soft-mask-weight recipe as cli.pretrain. The student export loads
into every inference CLI (`-model <output>/final`).
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp

from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig, PRESETS
from plantcaduceus_tpu.parallel import mesh as meshlib
from plantcaduceus_tpu.train import checkpoint as ckpt_lib
from plantcaduceus_tpu.train import data as data_lib
from plantcaduceus_tpu.train import distill as distill_lib
from plantcaduceus_tpu.train import loop as loop_lib
from plantcaduceus_tpu.train.optimizer import make_optimizer
from plantcaduceus_tpu.utils.model_loading import load_model_and_tokenizer
from plantcaduceus_tpu.utils.platform import maybe_force_platform


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--teacher", required=True,
                   help="teacher model: HF checkpoint dir or framework "
                        "export dir (a bare preset name is rejected unless "
                        "--allow-random-teacher: it means random weights)")
    p.add_argument("--student-preset", default=None, choices=sorted(PRESETS))
    p.add_argument("--student-config", default=None,
                   help="CaduceusConfig json path (alternative to preset)")
    p.add_argument("--dataset", required=True,
                   help="synthetic | file.tsv/.parquet | genome.fa | hf:<name>")
    p.add_argument("--seq-column", default="seq")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-steps", type=int, default=20000)
    p.add_argument("--temperature", type=float, default=2.0)
    p.add_argument("--alpha", type=float, default=0.5,
                   help="soft-target weight (1.0 = pure KL, 0.0 = pure MLM)")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup-steps", type=int, default=500)
    p.add_argument("--schedule", default="constant_with_warmup")
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--mlm-probability", type=float, default=0.15)
    p.add_argument("--soft-masked-weight", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=32)
    p.add_argument("--save-steps", type=int, default=1000)
    p.add_argument("--log-steps", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--allow-random-teacher", action="store_true",
                   help="permit a preset (randomly initialised) teacher — "
                        "for smoke tests only")
    p.add_argument("--fsdp", type=int, default=1, help="fsdp mesh axis size")
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(force=True, level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s",
                        datefmt="%Y-%m-%d %H:%M:%S")
    args = parse_args(argv)
    maybe_force_platform()
    meshlib.initialize_distributed()

    # A preset teacher resolves to RANDOM weights (model_loading contract) —
    # distilling from noise is never what the user wants; require an
    # explicit opt-in (tests/smoke runs use it).
    from pathlib import Path
    if not Path(args.teacher).is_dir() and not args.allow_random_teacher:
        raise SystemExit(
            f"--teacher {args.teacher!r} is a preset name, which resolves to "
            "randomly initialised weights — a distillation teacher must be a "
            "checkpoint dir (HF or framework export). Pass "
            "--allow-random-teacher to override (smoke tests only).")
    teacher_params, teacher_cfg, tokenizer = load_model_and_tokenizer(
        args.teacher, seed=args.seed)
    if args.student_config:
        student_cfg = CaduceusConfig.load(args.student_config)
    elif args.student_preset:
        student_cfg = CaduceusConfig.preset(args.student_preset)
    else:
        raise SystemExit("one of --student-preset / --student-config required")

    student = caduceus.init_params(jax.random.PRNGKey(args.seed), student_cfg)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(fsdp=args.fsdp))
    logging.info("mesh: %s; teacher %s -> student %s", dict(mesh.shape),
                 args.teacher,
                 args.student_preset or args.student_config)

    optimizer = make_optimizer(
        learning_rate=args.lr, schedule=args.schedule,
        warmup_steps=args.warmup_steps, total_steps=args.max_steps,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        params=student)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    init_state, distill_step = distill_lib.make_distill_step(
        teacher_cfg, student_cfg, optimizer, mesh, student, dtype=dtype,
        temperature=args.temperature, alpha=args.alpha,
        remat=not args.no_remat)
    state = init_state(student)

    # Teacher: one replicated device_put, reused every step.
    from jax.sharding import NamedSharding, PartitionSpec as P

    teacher_dev = jax.device_put(
        jax.tree.map(jnp.asarray, teacher_params),
        NamedSharding(mesh, P()))

    ckpt = ckpt_lib.CheckpointManager(args.output_dir,
                                      save_interval_steps=args.save_steps)
    ckpt_lib.save_config(args.output_dir, student_cfg)
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        logging.info("Resumed from step %d", int(state.step))

    seqs = data_lib.sequence_source(args.dataset, seq_column=args.seq_column,
                                    window=args.window, seed=args.seed)
    train_data = data_lib.PretrainDataset(
        seqs, tokenizer, args.batch_size,
        soft_masked_weight=args.soft_masked_weight,
        mlm_probability=args.mlm_probability, seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count())

    step_fn = lambda s, b: distill_step(s, teacher_dev, b)
    state = loop_lib.run_training(
        state, step_fn, None, train_data.iter_from(int(state.step)), None,
        args.max_steps, log_every=args.log_steps, eval_every=0, ckpt=ckpt,
        tokens_per_step=args.batch_size * args.window * jax.process_count(),
        mesh=mesh)

    params_host = jax.device_get(state.params)
    if jax.process_index() == 0:
        ckpt_lib.export_params(f"{args.output_dir}/final", params_host,
                               student_cfg)
        logging.info("Exported distilled student to %s/final",
                     args.output_dir)


if __name__ == "__main__":
    main()
