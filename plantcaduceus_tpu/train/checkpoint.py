"""Checkpoint save/resume via Orbax.

TPU-native replacement for the reference's three checkpoint formats (HF
save_pretrained dirs, Composer .pt, PEFT adapter dirs — SURVEY.md §5.4) with
one mechanism: an Orbax CheckpointManager over the TrainState pytree, with
HF-Trainer-style latest-checkpoint resume detection
(src/HF_pre_train.py:334-352 semantics).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import orbax.checkpoint as ocp

from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.train.step import TrainState

log = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory, save_interval_steps: int = 1000,
                 max_to_keep: int = 20):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=save_interval_steps,
            max_to_keep=max_to_keep,
            create=True,
        )
        self._interval = save_interval_steps
        self._mgr = ocp.CheckpointManager(str(self.directory), options=options)

    def save(self, step: int, state: TrainState, force: bool = False) -> bool:
        # Cheap host-side guard: orbax's own should_save check still does
        # per-call bookkeeping that adds measurable per-step overhead on the
        # remote runtime.
        if not force and self._interval and step % self._interval != 0:
            return False
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state._asdict()), force=force)
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template._asdict()))
        log.info("Restored checkpoint at step %d from %s", step, self.directory)
        # Re-establish the template's shardings: orbax does not reliably
        # place every restored leaf (e.g. optimizer step counters) onto the
        # mesh, and a mixed-placement state fails the jitted train step's
        # device check on multi-device meshes.
        import jax

        return jax.tree.map(
            lambda t, r: jax.device_put(r, t.sharding)
            if hasattr(t, "sharding") else r,
            state_template, TrainState(**restored))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_config(directory, cfg: CaduceusConfig) -> None:
    Path(directory).mkdir(parents=True, exist_ok=True)
    cfg.save(Path(directory) / "config.json")


def export_params(directory, params, cfg: CaduceusConfig) -> None:
    """Standalone weight export (inference checkpoints): config.json +
    params via Orbax StandardCheckpointer."""
    directory = Path(directory).absolute()
    save_config(directory, cfg)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory / "params", params, force=True)
    ckptr.wait_until_finished()


def load_params(directory):
    """Load an exported params dir -> (params, cfg)."""
    directory = Path(directory).absolute()
    cfg = CaduceusConfig.load(directory / "config.json")
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(directory / "params")
    return params, cfg
