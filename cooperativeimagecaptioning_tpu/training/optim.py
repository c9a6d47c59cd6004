"""Per-agent optimizers (ref: optimizer.py).

One Adam per agent ('speaker' = caption generator, 'listener' = vse), with the
reference's update rules:
  * element-wise gradient clamp to +/- grad_clip *before* Adam
    (ref: misc/utils.py:65-69 clip_gradient, called in optimizer.py:237-241);
  * torch Adam semantics: weight decay added to the (clipped) gradient before the
    moment updates (not decoupled);
  * alternating + non-reinforce: both agents step every iteration — the
    reference nests the listener optimizer under the speaker turn and removes
    'listener' from the turn list (optimizer.py:90-96, 233-242);
  * phases: 1 -> listener only, 2/3 -> speaker only (optimizer.py:162-182).

Learning rate is injected as a mutable hyperparameter so the epoch-decay schedule
(train.py:50-77) never recompiles the update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def make_tx(opt):
    def build(learning_rate):
        steps = [optax.clip(opt.grad_clip)]
        if opt.weight_decay:
            steps.append(optax.add_decayed_weights(opt.weight_decay))
        steps.append(optax.scale_by_adam(
            b1=opt.optim_alpha, b2=opt.optim_beta, eps=opt.optim_epsilon))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)
    return optax.inject_hyperparams(build)(learning_rate=opt.learning_rate)


def effective_turns(opt):
    """Turn list after the reference's listener-nesting rule (optimizer.py:90-96)."""
    if not opt.is_alternating:
        return ["optimizer"]
    turns = list(opt.alternating_turn or ["speaker"])
    if opt.retrieval_reward != "reinforce" and "listener" in turns and \
            "speaker" in turns:
        turns.remove("listener")
    return turns


def agents_to_update(opt, turn: str):
    """Which param subtrees step this iteration."""
    if opt.is_alternating:
        if opt.retrieval_reward == "reinforce":
            return ("speaker",) if turn == "speaker" else ("listener",)
        return ("speaker", "listener")
    if opt.phase == 1:
        return ("listener",)
    return ("speaker",)


class OptimizerManager:
    """Holds one optax state per agent and applies per-turn updates."""

    def __init__(self, opt, params):
        self.opt = opt
        self.txs = {}
        self.states = {}
        for agent in params:
            self.txs[agent] = make_tx(opt)
            self.states[agent] = self.txs[agent].init(params[agent])
        self._skipped = jnp.zeros((), jnp.int32)
        self._update = jax.jit(self._update_impl, static_argnames=("agents",))

    def set_lr(self, lr: float):
        for st in self.states.values():
            st.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def _update_impl(self, params, grads, states, agents):
        return guarded_update(self.txs, params, grads, states, agents)

    def step(self, params, grads, turn: str):
        agents = tuple(a for a in agents_to_update(self.opt, turn)
                       if a in params)
        params, self.states, ok = self._update(params, grads, self.states,
                                               agents)
        self.last_step_ok = ok  # device scalar; inspect lazily if desired
        # skipped-step counter stays on device (no per-iteration host sync);
        # read it via skipped_steps() at checkpoint/log time
        self._skipped = self._skipped + jnp.where(ok, 0, 1)
        return params

    def skipped_steps(self) -> int:
        """Steps the non-finite guard rejected so far (host sync: call at
        checkpoint cadence, not per iteration)."""
        return int(self._skipped)

    def state_dict(self):
        return self.states

    def load_state_dict(self, states):
        self.states = states


def guarded_update(txs, params, grads, states, agents):
    """Non-finite-guarded per-agent optimizer apply — the ONE implementation
    shared by the single-chip OptimizerManager and the fused distributed step
    (parallel/train_step.py), so the guard semantics cannot drift between
    paths.  A NaN/inf gradient on ANY updated agent leaves params AND
    optimizer state untouched; the decision is a device scalar (no host
    sync).  Returns (new_params, new_states, ok)."""
    ok = jnp.array(True)
    for agent in agents:
        for g in jax.tree.leaves(grads[agent]):
            ok = ok & jnp.all(jnp.isfinite(g))
    new_params = dict(params)
    new_states = dict(states)
    for agent in agents:
        updates, st = txs[agent].update(
            grads[agent], states[agent], params[agent])
        upd = optax.apply_updates(params[agent], updates)
        new_params[agent] = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), upd, params[agent])
        new_states[agent] = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), st, states[agent])
    return new_params, new_states, ok
