"""Checkpoint / exact resume via Orbax (SURVEY.md §5 "Checkpoint / resume").

The reference periodically pickles the MCMC sample list and restarts by
re-running from a loaded state [M]. Here checkpoints capture the complete
sampler state — params pytree, HMC adaptation state, PRNG key, iteration
counter — so a resumed chain continues *exactly* (same randomness stream,
same step sizes).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, step: int, state: dict, key, max_to_keep: int = 3) -> None:
    """Persist sampler state. ``state`` is the MCMC carry dict
    (params + HMCState blocks); ``key`` the upcoming PRNG key."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    payload = {"state": state, "key": jax.random.key_data(key)}
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, step: Optional[int] = None, template: Optional[dict] = None):
    """Restore (state, key, step). ``template`` (a matching pytree of arrays)
    restores with correct dtypes/shapes; without it, arrays come back as
    numpy with saved dtypes."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if template is not None:
        tmpl = {"state": template, "key": jax.random.key_data(jax.random.PRNGKey(0))}
        payload = mgr.restore(step, args=ocp.args.StandardRestore(tmpl))
    else:
        payload = mgr.restore(step)
    mgr.close()
    key = jax.random.wrap_key_data(np.asarray(payload["key"]))
    return payload["state"], key, step
