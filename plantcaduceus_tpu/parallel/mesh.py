"""Device mesh, sharding specs, and distributed init.

One mechanism replaces the reference's three torch DDP wrappers + NCCL
(SURVEY.md §2.7): a ``jax.sharding.Mesh`` with named axes

    data   — batch/data parallel (gradient psum, inference fan-out)
    fsdp   — optional parameter/optimizer-state sharding (ZeRO-style)
    seq    — optional sequence/context parallel over the L axis (halo
             ppermutes + the two-pass sharded scan; models/caduceus.py)
    tensor — optional tensor parallel over the d_inner axis of the mixer
    pipe   — optional pipeline parallel over the n_layer axis (GPipe
             microbatch schedule; parallel/pipeline.py)

Collectives are inserted by GSPMD from sharding annotations; they ride ICI
within a slice and DCN across slices automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1      # -1: all remaining devices
    fsdp: int = 1
    seq: int = 1
    tensor: int = 1
    pipe: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int, int, int, int]:
        fixed = self.fsdp * self.seq * self.tensor * self.pipe
        data = self.data
        if data == -1:
            if n_devices % fixed != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by "
                    f"fsdp*seq*tensor*pipe={fixed}")
            data = n_devices // fixed
        if data * fixed != n_devices:
            raise ValueError(
                f"mesh {data}x{self.fsdp}x{self.seq}x{self.tensor}"
                f"x{self.pipe} != {n_devices} devices")
        return data, self.fsdp, self.seq, self.tensor, self.pipe


def make_mesh(config: Optional[MeshConfig] = None,
              devices=None) -> Mesh:
    """Build the (data, fsdp, seq, tensor, pipe) mesh over all (or given)
    devices. ``pipe`` is innermost so pipeline stages sit on adjacent
    devices (stage hand-offs are nearest-neighbour ppermutes over ICI)."""
    config = config or MeshConfig()
    devices = np.asarray(devices if devices is not None else jax.devices())
    d, f, s, t, p = config.resolve(devices.size)
    return Mesh(devices.reshape(d, f, s, t, p),
                ("data", "fsdp", "seq", "tensor", "pipe"))


def initialize_distributed() -> None:
    """Multi-host init (no-op single-process). Call once at CLI start."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------


def batch_spec() -> P:
    """Input batches shard over data (and fsdp, which acts as extra DP for
    activations when parameters are fsdp-sharded)."""
    return P(("data", "fsdp"))


# mamba2 (SSD) leaves that stay replicated over 'tensor' although the
# head-sharded mixer consumes them on every tensor shard: each shard's
# gradient is a per-shard PARTIAL that train.step._sync_grads must
# additionally psum over 'tensor'. Kept here, next to the tp_axes rules in
# param_specs(), so the two views of "how does TP treat this leaf" cannot
# drift apart; validate_tp_grad_coverage() enforces that every mixer leaf
# is accounted for by exactly one of them.
TENSOR_PARTIAL_LEAVES = ("in_proj_B", "in_proj_C", "conv_B_w", "conv_B_b",
                         "conv_C_w", "conv_C_b")

# Block-level leaves outside the tensor-sharded mixer interior (the residual
# RMS norm): replicated over 'tensor' AND their gradients are already full
# on every shard (the mixer-output psum's transpose broadcasts the
# cotangent), so they need neither a 'tensor' spec axis nor a grad psum.
_TP_FULL_GRAD_BLOCK_LEAVES = ("norm_weight",)


def validate_tp_grad_coverage(pspec_tree) -> None:
    """Assert every per-block parameter leaf is covered by the TP gradient
    rules: either tensor-sharded (local grads), listed in
    TENSOR_PARTIAL_LEAVES (replicated, partial grads -> tensor psum), or a
    known full-grad residual-norm leaf. A new/renamed mixer leaf that is
    none of these would otherwise train silently with wrong gradients under
    tensor parallelism — fail loudly at step-build time instead."""
    bad = []

    def check(path, spec):
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        if "blocks" not in names:
            return
        leaf = names[-1]
        if leaf in TENSOR_PARTIAL_LEAVES or leaf in _TP_FULL_GRAD_BLOCK_LEAVES:
            return
        if any(ax == "tensor" for ax in spec):
            return
        bad.append(leaf)

    jax.tree_util.tree_map_with_path(check, pspec_tree,
                                     is_leaf=lambda x: isinstance(x, P))
    if bad:
        raise ValueError(
            "tensor-parallel gradient rules don't cover mixer leaves "
            f"{sorted(set(bad))}: shard them over 'tensor' in "
            "parallel.mesh.param_specs, or add them to "
            "TENSOR_PARTIAL_LEAVES / _TP_FULL_GRAD_BLOCK_LEAVES with the "
            "matching _sync_grads semantics")


def param_specs(replicated: bool = True,
                pipeline: bool = False) -> "jax.tree_util.PyTreeDef":
    """Partition rules for the Caduceus parameter pytree.

    replicated=True (inference / small models): everything replicated.
    replicated=False: FSDP-shard the largest axis of each tensor over 'fsdp'
    and tensor-shard d_inner-bearing axes over 'tensor'.
    pipeline=True: additionally shard every block leaf's leading n_layer
    axis over 'pipe' (applies even when replicated — pipeline stages MUST
    hold disjoint layer shards); embedding/norm_f/lm_head stay replicated
    across stages and their gradients psum over 'pipe' in
    train.step._sync_grads.
    """

    def rule(path: str, shape: Tuple[int, ...]) -> P:
        if pipeline and "blocks" in path.split("/"):
            axes: list = [None] * len(shape)
            axes[0] = "pipe"
            if not replicated:
                free = [i for i, a in enumerate(axes)
                        if a is None and shape[i] > 1]
                if free:
                    axes[max(free, key=lambda i: shape[i])] = "fsdp"
            return P(*axes)
        if replicated:
            return P()
        # Tensor parallel: shard the d_inner axis of mixer weights.
        # mamba2 (SSD) names shard heads/d_inner the same way; its
        # group-shared B/C projections (in_proj_B/C, conv_B/C_*) stay
        # UNsharded over 'tensor' — every shard's heads consume the full
        # B/C, and train.step._sync_grads psums their gradients.
        tp_axes = {
            "in_proj_x": 3,   # [L, Gio, d, di]
            "in_proj_z": 3,
            "out_proj": 2,    # [L, Gio, di, d] -> shard di (contracted; psum)
            "conv_w": 2, "conv_b": 2,
            "x_proj_dt": 2,   # [L, G, di, R]
            "x_proj_B": 2, "x_proj_C": 2,
            "dt_proj_w": 3,   # [L, G, R, di]
            "dt_proj_b": 2, "A_log": 2, "D": 2,
            "in_proj_dt": 3,  # [L, G, d, H]
            "conv_x_w": 2, "conv_x_b": 2,        # [L, G, di, K] / [L, G, di]
            "mixer_norm_weight": 2,              # [L, Gio, di]
            "dt_bias": 2,                        # [L, G, H]
        }
        leaf = path.split("/")[-1]
        axes: list = [None] * len(shape)
        if leaf in tp_axes and len(shape) > tp_axes[leaf]:
            axes[tp_axes[leaf]] = "tensor"
        # FSDP: shard the largest remaining axis.
        free = [i for i, a in enumerate(axes) if a is None and shape[i] > 1]
        if free:
            biggest = max(free, key=lambda i: shape[i])
            axes[biggest] = "fsdp"
        return P(*axes)

    return rule


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_pspec_tree(params, replicated: bool = True,
                     pipeline: bool = False):
    """PartitionSpec pytree matching ``params`` (for shard_map in_specs)."""
    rule = param_specs(replicated, pipeline=pipeline)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: rule(_path_str(path), leaf.shape), params
    )


def shard_params(params, mesh: Mesh, replicated: bool = True):
    """Place a parameter pytree onto the mesh per :func:`param_specs`."""
    rule = param_specs(replicated)

    def place(path, leaf):
        spec = rule(_path_str(path), leaf.shape)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


_SEQ_SHARDED_KEYS = frozenset({"input_ids", "labels", "loss_weights"})


def shard_batch(batch, mesh: Mesh):
    """Place host arrays onto the mesh, sharded along the batch axis (and,
    when the mesh has a non-trivial seq axis, the known [B, L] token arrays
    — the keys the train step's context-parallel in_specs shard — along the
    length axis too).

    Each host passes its own PROCESS-LOCAL batch (the data layer stripes
    records by (process_index, process_count)); the global batch is their
    concatenation, dim0 = local_batch * process_count. Multi-process
    placement must therefore go through
    ``jax.make_array_from_process_local_data`` — a plain ``device_put``
    would interpret every host's local rows as the same global array and
    silently drop all but 1/n of the prepared data."""
    sp = mesh.shape.get("seq", 1) > 1
    b = NamedSharding(mesh, batch_spec())
    bl = NamedSharding(mesh, P(("data", "fsdp"), "seq")) if sp else b
    n_proc = jax.process_count()

    def place(key, a):
        seq_shard = sp and key in _SEQ_SHARDED_KEYS and a.ndim == 2
        sharding = bl if seq_shard else b
        if n_proc == 1:
            return jax.device_put(a, sharding)
        # dim0 is per-host; every other dim is already global (the full
        # window length lives on every host even when `seq` shards it).
        global_shape = (a.shape[0] * n_proc,) + a.shape[1:]
        return jax.make_array_from_process_local_data(sharding, a,
                                                      global_shape)

    if isinstance(batch, dict):
        return {k: jax.tree.map(lambda a, k=k: place(k, a), v)
                for k, v in batch.items()}
    return jax.tree.map(lambda a: place(None, a), batch)
