"""Fused additive attention for the Att2in2 decode step.

Per decode step the attention reads att_feats [B, K, H] and p_att_feats
[B, K, A] from HBM — at reference dims and large batch this dwarfs every matmul
(hundreds of MB per step).  The XLA graph additionally materializes the
[B, K, A] tanh intermediate.  This kernel streams one batch tile's feature
blocks through VMEM and emits only att_res [B, H]:

    att_h  = h @ W_h2att + b                       (MXU)
    scores = tanh(p_att + att_h[:, None, :]) @ alpha + b_alpha
    w      = softmax(scores) [masked-renormalized]  (ref AttModel.py:480-483;
             the renormalization is skipped when no mask, exactly like the ref)
    out    = sum_k w_k * att_emb_k

Gradients: custom_vjp recomputes the pure-JAX reference in the backward pass, so
the kernel is safe inside training graphs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(h, att_emb, p_att, w_h2att, b_h2att, w_alpha, b_alpha,
                        masks):
    """Pure-JAX semantics (= models/layers.additive_attention)."""
    att_h = h @ w_h2att + b_h2att
    dot = jnp.tanh(p_att + att_h[:, None, :])
    scores = jnp.squeeze(dot @ w_alpha, -1) + b_alpha
    w = jax.nn.softmax(scores, axis=-1)
    if masks is not None:
        w = w * masks
        w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.einsum("bk,bkh->bh", w, att_emb)


def _make_kernel(use_mask: bool):
    def kernel(*refs):
        if use_mask:
            (h_ref, emb_ref, patt_ref, wh_ref, bh_ref, wa_ref, ba_ref,
             mask_ref, out_ref) = refs
        else:
            (h_ref, emb_ref, patt_ref, wh_ref, bh_ref, wa_ref, ba_ref,
             out_ref) = refs
        att_h = jnp.dot(h_ref[:], wh_ref[:],
                        preferred_element_type=jnp.float32) + bh_ref[:]
        K = patt_ref.shape[1]
        dot = jnp.tanh(patt_ref[:].astype(jnp.float32) + att_h[:, None, :])
        # [BB, K, A] . [A] -> [BB, K]; multiply-reduce (Mosaic rejects batched
        # dot_general inside kernels)
        scores = jnp.sum(dot * wa_ref[:][:, 0][None, None, :],
                         axis=2) + ba_ref[0, 0]
        w = jax.nn.softmax(scores, axis=-1)
        if use_mask:
            w = w * mask_ref[:]
            w = w / jnp.sum(w, axis=1, keepdims=True)
        out_ref[:] = jnp.sum(
            w[:, :, None] * emb_ref[:].astype(jnp.float32),
            axis=1).astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("block_b", "use_mask"))
def _attention_pallas(h, att_emb, p_att, w_h2att, b_h2att, w_alpha, b_alpha,
                      masks, use_mask: bool, block_b: int = 64):
    # block_b=64: double-buffered [bb,K,H]+[bb,K,A] bf16 inputs + the f32 tanh
    # intermediate must fit the 16MB scoped VMEM (128 OOMs at K=36, H=A=512)
    B, K, H = att_emb.shape
    A = p_att.shape[2]
    bb = min(block_b, B)
    while B % bb:
        bb //= 2
    grid = (B // bb,)
    in_specs = [
        pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, K, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, K, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((A, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [h, att_emb, p_att, w_h2att, b_h2att.reshape(1, -1), w_alpha,
            jnp.asarray(b_alpha).reshape(1, 1)]
    if use_mask:
        in_specs.append(pl.BlockSpec((bb, K), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(masks)
    return pl.pallas_call(
        _make_kernel(use_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), h.dtype),
    )(*args)


@jax.custom_vjp
def fused_attention(h, att_emb, p_att, w_h2att, b_h2att, w_alpha, b_alpha,
                    masks):
    """Dispatch: Pallas on TPU, reference math elsewhere.  masks may be None."""
    if jax.devices()[0].platform in ("tpu", "axon"):
        try:
            if masks is None:
                return _attention_pallas(h, att_emb, p_att, w_h2att, b_h2att,
                                         w_alpha, b_alpha, None,
                                         use_mask=False)
            return _attention_pallas(h, att_emb, p_att, w_h2att, b_h2att,
                                     w_alpha, b_alpha, masks, use_mask=True)
        except Exception:
            pass
    return attention_reference(h, att_emb, p_att, w_h2att, b_h2att, w_alpha,
                               b_alpha, masks)


def _fwd(*args):
    return fused_attention(*args), args


def _bwd(args, g):
    _, vjp = jax.vjp(attention_reference, *args)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
