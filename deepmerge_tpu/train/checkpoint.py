"""Checkpoint / resume (orbax).

Same logical contents and cadence as the reference's ``torch.save`` dict
``{net, optimizer, epoch, time, scales, depth, name}`` every 5 epochs and
every epoch ≥ 90 (``Train_SMT.py:317-343``); resume restores params +
optimizer state and continues from ``epoch + 1`` (``:163-175``).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from deepmerge_tpu.config import Config
from deepmerge_tpu.train.loop import TrainState


def should_checkpoint(epoch: int, cfg: Config) -> bool:
    """Reference cadence: (epoch+1) % 5 == 0 or epoch+1 >= 90."""
    t = cfg.train
    return (epoch + 1) % t.checkpoint_every == 0 or (
        epoch + 1 >= t.checkpoint_tail_from
    )


class CheckpointManager:
    def __init__(self, directory: str, cfg: Config):
        self.directory = os.path.abspath(directory)
        self.cfg = cfg
        # created lazily in save(): restore-only users (inference with a
        # mistyped --checkpoint-dir, read-only mounts) must not mkdir
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, epoch: int) -> str:
        # model-name-stamped directory, analog of the reference's
        # date+name-stamped filename (Train_SMT.py:317-325)
        return os.path.join(
            self.directory, f"{self.cfg.model.name}_epoch{epoch + 1:04d}"
        )

    def save(self, state: TrainState, epoch: int, elapsed: float = 0.0) -> str:
        os.makedirs(self.directory, exist_ok=True)
        path = self._path(epoch)
        payload = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "batch_stats": jax.device_get(state.batch_stats),
            "step": np.asarray(state.step),
        }
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        meta = {
            "epoch": epoch,
            "time": elapsed,
            "scales": list(self.cfg.model.input_image_scales),
            "depth": list(self.cfg.model.depth),
            "name": self.cfg.model.name,
            "config": json.loads(self.cfg.to_json()),
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        return path

    def latest_path(self) -> Optional[str]:
        """Newest checkpoint of THIS model (by meta epoch).

        Filtered on the model-name prefix and ordered by the recorded
        epoch, so a shared checkpoint directory holding several runs
        (e.g. a v3 and a later v4) never restores another model's payload
        into this TrainState.
        """
        if not os.path.isdir(self.directory):
            return None
        prefix = f"{self.cfg.model.name}_epoch"
        best, best_epoch = None, -1
        for d in sorted(os.listdir(self.directory)):
            full = os.path.join(self.directory, d)
            meta_path = os.path.join(full, "meta.json")
            if not d.startswith(prefix) or not os.path.exists(meta_path):
                continue
            try:
                with open(meta_path) as f:
                    epoch = int(json.load(f).get("epoch", -1))
            except (OSError, ValueError, json.JSONDecodeError):
                continue
            if epoch > best_epoch:
                best, best_epoch = full, epoch
        return best

    def restore(
        self,
        state: TrainState,
        path: Optional[str] = None,
        for_resume: bool = False,
    ) -> tuple[TrainState, int, float]:
        """Returns (state, start_epoch, elapsed).

        With ``for_resume=True`` (the resume-training path) a checkpoint
        at/past the final epoch raises like the reference
        (``Train_SMT.py:174-175``). Plain restores — the extract/inference
        path loading a COMPLETED run's final checkpoint — must not.
        """
        path = path or self.latest_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "batch_stats": jax.device_get(state.batch_stats),
            "step": np.asarray(state.step),
        }
        payload = self._ckptr.restore(path, template)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        epoch = int(meta["epoch"])
        if for_resume and epoch + 1 >= self.cfg.train.num_epochs:
            # reference semantics (Train_SMT.py:174-175): resuming at or
            # past the schedule is an error. Re-serving a COMPLETED run
            # uses a plain restore instead (eval.py --serve-only).
            raise ValueError(
                f"checkpoint epoch {epoch} is at/past num_epochs "
                f"{self.cfg.train.num_epochs}"
            )
        state = state.replace(
            params=payload["params"],
            opt_state=payload["opt_state"],
            batch_stats=payload["batch_stats"],
            step=payload["step"],
        )
        return state, epoch + 1, float(meta.get("time", 0.0))
