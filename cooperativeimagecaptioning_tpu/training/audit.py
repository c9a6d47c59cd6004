"""Runtime gradient-isolation audit (ref: AlternatingJointModel.py:571-686
changeModelUpdateStatus / UpdateError).

The reference's debug mode deep-copies both submodels every iteration and
compares layer-by-layer against the expected requires_grad status, printing
UpdateError warnings.  Here the functional design makes the check cheap: a
training step builds NEW param arrays, so the pre-step tree is a free
snapshot — no copy.  The audit compares old/new leaves on device and raises:

  * UpdateError when an agent's updated/frozen status contradicts the turn's
    expected agent set (the reference's whole-model check, :625-634/:672-681);
  * a warning (like the reference's caught-and-printed per-layer error,
    :615-623) when leaves within one agent disagree — legitimate zero
    gradients (e.g. an unused head) can cause this, so it is not fatal.

Opt-in via --audit_grad_isolation 1; zero cost when off (no snapshots, no
syncs).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp


class UpdateError(Exception):
    """An agent was (not) updated against the turn's expectations."""


def _changed_flags(old_tree, new_tree):
    """One device program -> one host transfer: per-leaf any(old != new)."""
    flags = jax.tree.map(lambda a, b: jnp.any(a != b), old_tree, new_tree)
    return jax.tree.map(bool, jax.device_get(flags))


def audit_update(prev_params, new_params, expected_agents):
    """Verify per-agent update isolation for one optimizer step.

    prev_params/new_params: the joint trees around `optim.step`.
    expected_agents: agents that were supposed to step this turn.
    Returns {agent: {'updated': bool, 'consistent': bool}}.
    """
    report = {}
    for agent in prev_params:
        flags = _changed_flags(prev_params[agent], new_params[agent])
        leaves = jax.tree.leaves(flags)
        updated = any(leaves)
        consistent = all(lf == leaves[0] for lf in leaves)
        report[agent] = {"updated": updated, "consistent": consistent}
        expected = agent in expected_agents
        if updated != expected:
            raise UpdateError(
                f"{agent} update status was supposed to be {expected} "
                f"but in fact was {updated}")
        if not consistent:
            warnings.warn(
                f"{agent} had inconsistent update status across its "
                f"parameters (some leaves changed, some did not — zero "
                f"gradients or a masked update)", stacklevel=2)
    return report
