"""Checkpointing: every-epoch Orbax saves, auto-resume, greedy reload.

Parity targets:
- ``ModelCheckpoint(save_top_k=-1, every_n_epochs=1)`` → an Orbax
  ``CheckpointManager`` that keeps every epoch (``train.py:92-99``);
- auto-resume from the newest checkpoint (``train.py:77-91``);
- ``--reload_only_weights`` greedy weights-only restore tolerating missing /
  mismatched entries (``utils.py:226-249``), including torch ``.ckpt``/
  ``.pth`` files via the torch-import converter.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.torch_import import convert_state_dict, load_torch_checkpoint

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Thin wrapper over Orbax: save {state, class weights, epoch} per epoch."""

    def __init__(self, directory, keep_every: bool = True):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if keep_every else 3, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state, extras: Optional[Dict[str, Any]] = None):
        if extras is None:
            # keep the on-disk tree structure uniform so restores never
            # need structure-dependent templates
            extras = {"cle_class_weights": np.zeros(6),
                      "pse_class_weights": np.zeros(3)}
        payload = {"state": state, "extras": extras}
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, epoch: Optional[int] = None,
                extras_template: Optional[Dict[str, Any]] = None
                ) -> Tuple[Any, Dict[str, Any], int]:
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if extras_template is None:
            extras_template = {"cle_class_weights": np.zeros(6),
                               "pse_class_weights": np.zeros(3)}
        template = {"state": state_template, "extras": extras_template}
        restored = self._mgr.restore(epoch,
                                     args=ocp.args.StandardRestore(template))
        return restored["state"], restored.get("extras") or {}, int(epoch)

    def close(self):
        self._mgr.close()


def greedy_restore_variables(variables: Dict[str, Any], ckpt_path: str
                             ) -> Dict[str, Any]:
    """Weights-only greedy reload from a torch ``.ckpt``/``.pth`` or an
    ``.npz`` of flat arrays; name+shape matching, mismatches skipped with
    warnings (reference ``load_state_dict_greedy``, ``utils.py:226-249``)."""
    path = Path(ckpt_path)
    if path.suffix in (".ckpt", ".pth", ".pt"):
        state_dict = load_torch_checkpoint(str(path))
    elif path.suffix == ".npz":
        with np.load(path) as z:
            state_dict = {k: z[k] for k in z.files}
    else:
        raise ValueError(f"unsupported weights file: {path}")
    new_vars, report = convert_state_dict(state_dict, dict(variables))
    logger.info("[greedy_restore] %s", report)
    return new_vars
