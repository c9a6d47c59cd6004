"""Fused greedy logit head: logits = h @ W + b -> (argmax, logprob of argmax).

The vocabulary projection is the decode loop's dominant cost (H=512 x V~9.5k per
step).  The XLA path materializes [B, V] logits (+ log_softmax) to HBM every
step; this kernel streams vocabulary tiles through VMEM keeping only running
(argmax, max, logsumexp) per row — O(B) output instead of O(B*V) traffic.

Grid: (B/BB, V/BV) with the vocab dimension iterated sequentially ("arbitrary")
so scratch accumulators carry across vocab tiles.  Tie-breaking: first maximum
wins (strict >), matching torch.max / jnp.argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cooperativeimagecaptioning_tpu.ops.pallas._dispatch import (
    kernel_fallback, on_tpu, vocab_mesh)

NEG = -1e30


def greedy_head_reference(h, w, b):
    """Pure-JAX semantics (also the CPU fallback): argmax + its logprob."""
    logits = (h @ w + b).astype(jnp.float32)
    it = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    m = jnp.max(logits, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))
    return it, m - lse


def _kernel(h_ref, w_ref, b_ref, it_ref, lp_ref, best_ref, m_ref, s_ref):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, NEG)
        m_ref[:] = jnp.full_like(m_ref, NEG)
        s_ref[:] = jnp.zeros_like(s_ref)
        it_ref[:] = jnp.zeros_like(it_ref)

    logits = jnp.dot(h_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    BB, BV = logits.shape

    tile_max = jnp.max(logits, axis=1, keepdims=True)          # [BB, 1]
    tile_arg = jnp.argmax(logits, axis=1).astype(jnp.int32)    # [BB]
    tile_arg = (tile_arg + j * BV).reshape(BB, 1)

    # streaming logsumexp
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, tile_max)
    s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + \
        jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_ref[:] = m_new

    # running argmax, first max wins (strict >)
    improved = tile_max > best_ref[:]
    it_ref[:] = jnp.where(improved, tile_arg, it_ref[:])
    best_ref[:] = jnp.where(improved, tile_max, best_ref[:])

    @pl.when(j == nv - 1)
    def _finish():
        lp_ref[:] = best_ref[:] - (m_ref[:] + jnp.log(s_ref[:]))


@functools.partial(jax.jit,
                   static_argnames=("block_b", "block_v", "interpret"))
def greedy_head_pallas(h, w, b, block_b: int = 256, block_v: int = 1024,
                       interpret: bool = False):
    """h [B, H], w [H, V], b [V] -> (it [B] int32, lp [B] f32).

    B must divide by block_b; V is padded to block_v internally (padding gets
    a -inf bias so it never wins)."""
    B, H = h.shape
    V = w.shape[1]
    bb = min(block_b, B)
    while B % bb:
        bb //= 2
    V_pad = -(-V // block_v) * block_v
    if V_pad != V:
        w = jnp.pad(w, ((0, 0), (0, V_pad - V)))
        b = jnp.pad(b, (0, V_pad - V), constant_values=NEG)

    grid = (B // bb, V_pad // block_v)
    it, lp = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_v), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, 1), jnp.float32),  # best
            pltpu.VMEM((bb, 1), jnp.float32),  # running max
            pltpu.VMEM((bb, 1), jnp.float32),  # running sumexp
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(h, w, b.reshape(1, -1))
    return it[:, 0], lp[:, 0]


def _kernel_resident(h_ref, w_ref, b_ref, it_ref, lp_ref):
    """Whole-W-resident variant: W (bf16, ~10MB at reference dims) lives in
    VMEM across all batch tiles (constant index map), so per step it is read
    from HBM once instead of once per batch tile."""
    logits = jnp.dot(h_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]
    m = jnp.max(logits, axis=1, keepdims=True)
    it_ref[:] = jnp.argmax(logits, axis=1).astype(jnp.int32)[:, None]
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
    lp_ref[:] = m - lse


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def greedy_head_pallas_resident(h, w, b, block_b: int = 64,
                                interpret: bool = False):
    B, H = h.shape
    V = w.shape[1]
    bb = min(block_b, B)
    while B % bb:
        bb //= 2
    V_pad = -(-V // 128) * 128
    if V_pad != V:
        w = jnp.pad(w, ((0, 0), (0, V_pad - V)))
        b = jnp.pad(b, (0, V_pad - V), constant_values=NEG)
    it, lp = pl.pallas_call(
        _kernel_resident,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, V_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(h, w, b.reshape(1, -1))
    return it[:, 0], lp[:, 0]


def _pick_pallas_head(h, w, b):
    if h.shape[0] % 8:  # awkward batch tiles: keep the pure-XLA math
        return greedy_head_reference(h, w, b)
    # resident variant needs W in VMEM: bf16 + V*H*2 bytes within ~11MB
    if w.dtype == jnp.bfloat16 and w.shape[0] * w.shape[1] * 2 <= 11 << 20:
        return greedy_head_pallas_resident(h, w, b)
    return greedy_head_pallas(h, w, b)


@jax.custom_vjp
def _pallas_head_nograd(h, w, b):
    return _pick_pallas_head(h, w, b)


def _head_fwd(h, w, b):
    return _pick_pallas_head(h, w, b), (h, w, b)


def _head_bwd(res, g):
    # Greedy selections are non-differentiable (argmax) and every consumer
    # stop-gradients the logprob (greedy baselines / rewards), so zero
    # cotangents are exact here — this just makes the kernel legal inside
    # grad graphs (e.g. the fused on-device-cider greedy baseline).
    h, w, b = res
    return (jnp.zeros_like(h), jnp.zeros_like(w), jnp.zeros_like(b))


_pallas_head_nograd.defvjp(_head_fwd, _head_bwd)


def greedy_head_sharded(h, w, b, mesh, vocab_axis: str = "model",
                        data_axis: str = "data", interpret: bool = False):
    """Vocab-sharded greedy head: the m=1 case of the sharded beam merge —
    each model shard finds its local (argmax, max, logsumexp) with the
    resident-W kernel, the global winner + total logsumexp merge over ICI.
    First-max tie breaking is preserved (lower shard = lower global index)."""
    from cooperativeimagecaptioning_tpu.ops.pallas import beam_head
    vals, idx, lse = beam_head.beam_head_sharded(
        h, w, b, 1, mesh, vocab_axis, data_axis, interpret=interpret)
    return idx[:, 0], vals[:, 0] - lse


@jax.custom_vjp
def _sharded_head_nograd(h, w, b):
    mesh, va, da = vocab_mesh()
    return greedy_head_sharded(h, w, b, mesh, va, da)


def _sharded_fwd(h, w, b):
    return _sharded_head_nograd(h, w, b), (h, w, b)


_sharded_head_nograd.defvjp(_sharded_fwd, _head_bwd)


def greedy_head(h, w, b):
    """Dispatch: sharded path on a registered model-parallel mesh, else
    Pallas on TPU, reference math elsewhere."""
    vm = vocab_mesh()
    if vm is not None and w.shape[1] % vm[0].shape[vm[1]] == 0:
        return _sharded_head_nograd(h, w, b)
    if on_tpu():
        try:
            return _pallas_head_nograd(h, w, b)
        except Exception as err:
            kernel_fallback("greedy_head", err)
    return greedy_head_reference(h, w, b)
