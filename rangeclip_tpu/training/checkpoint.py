"""Orbax checkpointing of the train state.

Reference: model.py:368-393 — dict checkpoints {train_step, encoder,
decoder, log_temperature_text, log_temperature_image, optimizer} with
defaults injected for missing temperatures on restore; filename template
``checkpoints/depth_segmentation_model-{step}`` (train_util.py:552-556).

Reference bugs deliberately NOT replicated (SURVEY.md section 7):
  * ``restore_depth_encoder`` is called but never defined
    (train_util.py:158) — here encoder-only restore exists and works;
  * the reference rebuilds the optimizer after restoring it
    (train_util.py:163-166), silently discarding optimizer state — here
    restore returns the restored optimizer state intact.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from rangeclip_tpu.training.state import TrainState


class CheckpointManager:
    def __init__(self, checkpoint_dir: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(checkpoint_dir)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState) -> None:
        step = int(jax.device_get(state.step))
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``template`` (shapes/dtypes)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return restored

    def _raw_restore(self, step: int):
        """Template-free restore as host numpy arrays, independent of the
        device topology the checkpoint was SAVED under.

        A multi-process run (tests/test_multihost.py) saves arrays whose
        recorded shardings name devices from every process; a plain
        ``manager.restore(step)`` then refuses to load them anywhere else
        ("available devices are different").  Restoring each leaf as
        ``np.ndarray`` via the checkpoint's own metadata sidesteps saved
        shardings entirely — the reference's ``torch.load(map_location=
        'cpu')`` portability (model.py:368-371).
        """
        path = os.path.join(self.directory, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        meta_tree = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
        )
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )

    def restore_weights(self, step: Optional[int] = None):
        """Raw (template-free) restore of just (params, batch_stats, step).

        Works for a checkpoint saved under ANY optimizer configuration —
        weight decay, frozen-encoder ``multi_transform``, etc. — because no
        opt_state template has to match.  For consumers that discard
        optimizer state anyway (export to the reference's .pth format).
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        raw = self._raw_restore(step)
        params = jax.tree.map(jnp.asarray, raw["params"])
        batch_stats = jax.tree.map(jnp.asarray, raw.get("batch_stats", {}))
        return params, batch_stats, int(raw["step"])

    def restore_encoder_params(self, template: TrainState,
                               step: Optional[int] = None):
        """Encoder-only restore (the working version of the reference's
        missing ``restore_depth_encoder``; encoder.py:144-156 capability).

        Returns (params, batch_stats) with the encoder subtrees replaced —
        the BN running statistics matter as much as the weights for a
        frozen-encoder finetune, where the encoder always runs on them
        (model.py:397 eval-mode encoder).
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        # Raw (template-free) restore: the source run's optimizer structure
        # need not match this run's (e.g. a plain-Adam pretrain restored
        # into a frozen-encoder multi_transform finetune).
        raw = self._raw_restore(step)
        params = dict(template.params)
        params["depth_encoder"] = jax.tree.map(
            jnp.asarray, raw["params"]["depth_encoder"]
        )
        batch_stats = dict(template.batch_stats)
        if "depth_encoder" in raw.get("batch_stats", {}):
            batch_stats["depth_encoder"] = jax.tree.map(
                jnp.asarray, raw["batch_stats"]["depth_encoder"]
            )
        return params, batch_stats

    def close(self) -> None:
        self._mgr.close()
