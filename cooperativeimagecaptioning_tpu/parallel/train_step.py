"""Distributed training step: loss + grads + per-agent Adam update in ONE jitted
program, GSPMD-partitioned over the (data, model) mesh.

This is the multi-chip path (vs training/loop.py's single-chip two-stage driver):
params live replicated (or vocab-sharded on 'model'), the batch is sharded on
'data', and XLA inserts the gradient all-reduce and the contrastive-matrix
all-gathers over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cooperativeimagecaptioning_tpu import models as model_zoo
from cooperativeimagecaptioning_tpu.training import joint
from cooperativeimagecaptioning_tpu.training.optim import (
    make_tx, agents_to_update)


def make_distributed_train_step(opt, turn, mesh, donate=True):
    """Returns (init_opt_states, step_fn).

    step_fn(params, opt_states, batch, rng, hp, reward)
        -> (params, opt_states, loss, aux)
    """
    modules = {"speaker": model_zoo.setup(opt, opt.caption_model,
                                          "caption_model")}
    txs = {}

    def init_opt_states(params):
        states = {}
        for agent in params:
            txs[agent] = make_tx(opt)
            states[agent] = txs[agent].init(params[agent])
        return states

    agents = agents_to_update(opt, turn)

    def step(params, opt_states, batch, rng, hp, reward):
        def loss_of(p):
            return joint.loss_fn(modules, p, opt, batch, rng, hp, turn,
                                 reward, train=True)
        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        # device-side non-finite guard, same semantics as the single-chip
        # OptimizerManager (training/optim.py:76-93): a NaN/inf gradient
        # leaves params AND Adam state untouched on every chip
        ok = jnp.array(True)
        for agent in agents:
            if agent not in params:
                continue
            for g in jax.tree.leaves(grads[agent]):
                ok = ok & jnp.all(jnp.isfinite(g))
        new_params = dict(params)
        new_states = dict(opt_states)
        for agent in agents:
            if agent not in params:
                continue
            updates, st = txs[agent].update(
                grads[agent], opt_states[agent], params[agent])
            upd = jax.tree.map(lambda p, u: p + u, params[agent], updates)
            new_params[agent] = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), upd, params[agent])
            new_states[agent] = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), st, opt_states[agent])
        aux = dict(aux)
        aux["step_ok"] = ok
        return new_params, new_states, loss, aux

    repl = NamedSharding(mesh, P())
    step_jit = jax.jit(
        step,
        # the batch entry is None: its sharding follows the committed arrays,
        # so ANY batch structure works — including the reward-ref keys
        # ('refs', 'ref_mask', 'df_table') that on_device_cider/soft_cider
        # need (a fixed 5-key sharding dict rejected them before)
        in_shardings=(repl, repl, None, repl, repl,
                      NamedSharding(mesh, P("data"))),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1) if donate else ())

    def step_fn(params, opt_states, batch, rng, hp, reward):
        from cooperativeimagecaptioning_tpu.parallel.mesh import shard_batch
        return step_jit(params, opt_states, shard_batch(batch, mesh),
                        rng, hp, reward)

    return init_opt_states, step_fn
