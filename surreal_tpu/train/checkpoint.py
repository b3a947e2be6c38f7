"""Checkpoint save/restore with latest + best-by-eval retention.

Role of the reference's `surreal/utils/checkpoint.py` [SURVEY.md §2, §5]:
periodic and best-reward checkpointing of module dicts + bookkeeping
metadata, restore latest/best on restart. Built on Orbax (TensorStore/OCDBT
underneath — the native-code serialization path replacing torch.save /
pyarrow), async-capable and multi-host-safe.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Directory layout:
        <root>/latest/<step>/...   (rolling, keep `keep_latest`)
        <root>/best/<step>/...     (single best by score)
        <root>/meta.json           ({best_score, best_step})
    """

    def __init__(self, root: str, keep_latest: int = 3):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        # Distinct barrier_sync_key_prefix per manager: in a multi-process
        # run both managers save the SAME step number back-to-back (latest,
        # then best) asynchronously; with the default (empty) prefix their
        # coordination-service barrier keys collide and the ranks can pair
        # rank0's latest-save barrier with rank1's best-save barrier —
        # an intermittent cross-rank deadlock at the end of training
        # (tests/test_multihost.py hang, round-3 regression).
        self._latest_mgr = ocp.CheckpointManager(
            os.path.join(self.root, "latest"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_latest, create=True,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="latest"),
            ),
        )
        self._best_mgr = ocp.CheckpointManager(
            os.path.join(self.root, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="best"),
            ),
        )
        self._meta_path = os.path.join(self.root, "meta.json")
        self._meta = {"best_score": None, "best_step": None}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self._meta = json.load(f)

    # ---- save ----
    def save(self, step: int, state: Any, score: float | None = None) -> None:
        """Save rolling-latest; if `score` beats the best so far, also save
        to best/ (reference: best-by-eval-reward retention)."""
        self._latest_mgr.save(step, args=ocp.args.StandardSave(state))
        if score is not None and (
            self._meta["best_score"] is None or score > self._meta["best_score"]
        ):
            self._best_mgr.save(step, args=ocp.args.StandardSave(state))
            self._meta = {"best_score": float(score), "best_step": int(step)}
            if jax.process_index() == 0:  # single-writer, atomic (multihost)
                tmp = self._meta_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(self._meta, f)
                os.replace(tmp, self._meta_path)

    def wait(self) -> None:
        self._latest_mgr.wait_until_finished()
        self._best_mgr.wait_until_finished()

    # ---- restore ----
    def latest_step(self) -> int | None:
        return self._latest_mgr.latest_step()

    def restore(self, target: Any, step: int | None = None, best: bool = False) -> Any:
        """Restore into the structure of `target` (an abstract or concrete
        pytree of the same shape). Returns the restored pytree."""
        mgr = self._best_mgr if best else self._latest_mgr
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.root}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    @property
    def best_info(self) -> dict:
        return dict(self._meta)

    def close(self):
        self.wait()
        self._latest_mgr.close()
        self._best_mgr.close()
