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
        # shared non-finite-guarded apply (training/optim.guarded_update):
        # identical semantics to the single-chip OptimizerManager by
        # construction — a NaN/inf gradient leaves params AND Adam state
        # untouched on every chip
        from cooperativeimagecaptioning_tpu.training.optim import \
            guarded_update
        live = tuple(a for a in agents if a in params)
        new_params, new_states, ok = guarded_update(
            txs, params, grads, opt_states, live)
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
