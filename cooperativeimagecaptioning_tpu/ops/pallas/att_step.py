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

from cooperativeimagecaptioning_tpu.ops.pallas._dispatch import (
    kernel_fallback, on_tpu)


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


# ---------------------------------------------------------------------------
# int8-quantized feature streaming (decode-time)
# ---------------------------------------------------------------------------
#
# Decode is bound by streaming att_emb [B,K,H] + p_att [B,K,A] from HBM every
# step (STATUS.md roofline: ~91% of streaming bandwidth at bf16).  Both tensors
# are constant across the ~L decode steps, so quantize them ONCE after
# encode_features to per-(b,k)-row int8 and dequantize inside the kernel: HBM
# traffic per step halves vs bf16 (quarters vs f32).  Per-row symmetric scales
# keep the relative element error <= 1/254 of the row max.

def quantize_features(att_emb, p_att):
    """Per-(b,k) symmetric int8 quantization of the attention context.

    Returns (emb_q int8 [B,K,H], emb_scale f32 [B,K],
             p_q int8 [B,K,A], p_scale f32 [B,K]).
    """
    e = att_emb.astype(jnp.float32)
    se = jnp.maximum(jnp.max(jnp.abs(e), axis=-1), 1e-12) / 127.0
    eq = jnp.clip(jnp.round(e / se[..., None]), -127, 127).astype(jnp.int8)
    p = p_att.astype(jnp.float32)
    sp = jnp.maximum(jnp.max(jnp.abs(p), axis=-1), 1e-12) / 127.0
    pq = jnp.clip(jnp.round(p / sp[..., None]), -127, 127).astype(jnp.int8)
    return eq, se, pq, sp


def dequantize_features(emb_q, emb_scale, p_q, p_scale):
    emb = emb_q.astype(jnp.float32) * emb_scale[..., None]
    p_att = p_q.astype(jnp.float32) * p_scale[..., None]
    return emb, p_att


def attention_reference_q(h, emb_q, emb_scale, p_q, p_scale,
                          w_h2att, b_h2att, w_alpha, b_alpha, masks):
    """Dequantize-then-reference semantics of the quantized kernel."""
    emb, p_att = dequantize_features(emb_q, emb_scale, p_q, p_scale)
    return attention_reference(h, emb, p_att, w_h2att, b_h2att, w_alpha,
                               b_alpha, masks).astype(h.dtype)


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


def _pick_block_b(B, K, H, A, cap, itemsize=2):
    # Double-buffered [bb,K,H]+[bb,K,A] inputs plus the f32 tanh intermediate
    # must fit the 16MB scoped VMEM.  bb=64 is the measured sweet spot at
    # K=36, H=A=512 in bf16 (128 OOMs there); scale down with K, the hidden
    # dims AND the element width — f32 att features (default-precision eval
    # decode) double the input bytes and OOMed at the bf16-calibrated block
    # (20MB vs the 16MB scoped limit, at the outer jit's compile time where
    # the dispatch guard cannot catch it).
    budget = 64 * 36 * 512 * 2  # known-good bb*K*max(H,A)*itemsize bytes
    bb = min(cap, B)
    while bb > 8 and bb * K * max(H, A) * max(2, itemsize) > budget:
        bb //= 2
    while B % bb:
        bb //= 2
    return max(bb, 1)


@functools.partial(jax.jit,
                   static_argnames=("block_b", "use_mask", "interpret"))
def _attention_pallas(h, att_emb, p_att, w_h2att, b_h2att, w_alpha, b_alpha,
                      masks, use_mask: bool, block_b: int = 64,
                      interpret: bool = False):
    B, K, H = att_emb.shape
    A = p_att.shape[2]
    bb = _pick_block_b(B, K, H, A, block_b, att_emb.dtype.itemsize)
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
        interpret=interpret,
    )(*args)


def _make_kernel_q(use_mask: bool):
    def kernel(*refs):
        if use_mask:
            (h_ref, eq_ref, se_ref, pq_ref, sp_ref, wh_ref, bh_ref, wa_ref,
             ba_ref, mask_ref, out_ref) = refs
        else:
            (h_ref, eq_ref, se_ref, pq_ref, sp_ref, wh_ref, bh_ref, wa_ref,
             ba_ref, out_ref) = refs
        att_h = jnp.dot(h_ref[:], wh_ref[:],
                        preferred_element_type=jnp.float32) + bh_ref[:]
        p_att = pq_ref[:].astype(jnp.float32) * sp_ref[:][:, :, None]
        dot = jnp.tanh(p_att + att_h[:, None, :])
        scores = jnp.sum(dot * wa_ref[:][:, 0][None, None, :],
                         axis=2) + ba_ref[0, 0]
        w = jax.nn.softmax(scores, axis=-1)
        if use_mask:
            w = w * mask_ref[:]
            w = w / jnp.sum(w, axis=1, keepdims=True)
        # fold the per-row dequant scale into the softmax weight: one [BB,K]
        # multiply instead of scaling the [BB,K,H] block
        ws = w * se_ref[:]
        out_ref[:] = jnp.sum(
            ws[:, :, None] * eq_ref[:].astype(jnp.float32),
            axis=1).astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("block_b", "use_mask", "interpret"))
def _attention_pallas_q(h, emb_q, emb_scale, p_q, p_scale, w_h2att, b_h2att,
                        w_alpha, b_alpha, masks, use_mask: bool,
                        block_b: int = 64, interpret: bool = False):
    B, K, H = emb_q.shape
    A = p_q.shape[2]
    bb = _pick_block_b(B, K, H, A, block_b, emb_q.dtype.itemsize)
    grid = (B // bb,)
    in_specs = [
        pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, K, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, K, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((A, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [h, emb_q, emb_scale, p_q, p_scale, w_h2att,
            b_h2att.reshape(1, -1), w_alpha, jnp.asarray(b_alpha).reshape(1, 1)]
    if use_mask:
        in_specs.append(pl.BlockSpec((bb, K), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(masks)
    return pl.pallas_call(
        _make_kernel_q(use_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), h.dtype),
        interpret=interpret,
    )(*args)


@jax.custom_vjp
def fused_attention_q(h, emb_q, emb_scale, p_q, p_scale, w_h2att, b_h2att,
                      w_alpha, b_alpha, masks):
    """Quantized-context attention: Pallas on TPU, dequant+reference elsewhere.

    The quantized tensors come from quantize_features (run once per decode);
    gradients (only meaningful for h and the weights) flow through the
    dequantized reference math.
    """
    if on_tpu():
        try:
            return _attention_pallas_q(h, emb_q, emb_scale, p_q, p_scale,
                                       w_h2att, b_h2att, w_alpha, b_alpha,
                                       masks, use_mask=masks is not None)
        except Exception as err:
            kernel_fallback("fused_attention_q", err)
    return attention_reference_q(h, emb_q, emb_scale, p_q, p_scale,
                                 w_h2att, b_h2att, w_alpha, b_alpha, masks)


def _fwd_q(*args):
    return fused_attention_q(*args), args


def _bwd_q(args, g):
    _, vjp = jax.vjp(attention_reference_q, *args)
    return vjp(g.astype(args[0].dtype))


fused_attention_q.defvjp(_fwd_q, _bwd_q)


@jax.custom_vjp
def fused_attention(h, att_emb, p_att, w_h2att, b_h2att, w_alpha, b_alpha,
                    masks):
    """Dispatch: Pallas on TPU, reference math elsewhere.  masks may be None."""
    if on_tpu():
        try:
            if masks is None:
                return _attention_pallas(h, att_emb, p_att, w_h2att, b_h2att,
                                         w_alpha, b_alpha, None,
                                         use_mask=False)
            return _attention_pallas(h, att_emb, p_att, w_h2att, b_h2att,
                                     w_alpha, b_alpha, masks, use_mask=True)
        except Exception as err:
            kernel_fallback("fused_attention", err)
    return attention_reference(h, att_emb, p_att, w_h2att, b_h2att, w_alpha,
                               b_alpha, masks)


def _fwd(*args):
    return fused_attention(*args), args


def _bwd(args, g):
    _, vjp = jax.vjp(attention_reference, *args)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# K-major context layout (decode-time, flag-gated: --att_kmajor)
# ---------------------------------------------------------------------------
#
# At the reference K=36 the [bb, K, *] blocks above tile their last two dims,
# padding K 36->40 sublanes (~11% wasted bandwidth + VPU work on padding
# rows).  Streaming the context transposed — att_emb_t [K, B, H], p_att_t
# [K, B, A] — makes every big tile (bb, H)/(bb, A) exactly lane/sublane-
# aligned; only the small [K, bb] score matrix needs an in-kernel transpose
# (Mosaic refuses axis-0 reductions over the unaligned K dim).  Measured on
# v5e at B=8192/K=36 (scripts/bench_att_layout.py): 0.898 ms/step vs the
# b-major kernel's 1.105 — 1.23x on the isolated attention step.  The one-
# time ctx transpose after encode_features amortizes over the ~L=17 steps.


def attention_reference_kmajor(h, att_emb_t, p_att_t, w_h2att, b_h2att,
                               w_alpha, b_alpha, masks):
    """Reference semantics on the transposed layout (masks stay [B, K])."""
    emb = jnp.moveaxis(att_emb_t, 0, 1)
    p_att = jnp.moveaxis(p_att_t, 0, 1)
    return attention_reference(h, emb, p_att, w_h2att, b_h2att, w_alpha,
                               b_alpha, masks)


def _make_kernel_kmajor(use_mask: bool):
    def kernel(*refs):
        if use_mask:
            (h_ref, emb_ref, patt_ref, wh_ref, bh_ref, wa_ref, ba_ref,
             mask_ref, out_ref) = refs
        else:
            (h_ref, emb_ref, patt_ref, wh_ref, bh_ref, wa_ref, ba_ref,
             out_ref) = refs
        K = patt_ref.shape[0]
        att_h = jnp.dot(h_ref[:], wh_ref[:],
                        preferred_element_type=jnp.float32) + bh_ref[:]
        # the VPU-dominant tanh runs on exactly-aligned (bb, A) tiles
        dot = jnp.tanh(patt_ref[:].astype(jnp.float32) + att_h[None, :, :])
        scores = jnp.sum(dot * wa_ref[:][:, 0][None, None, :],
                         axis=2) + ba_ref[0, 0]            # [K, BB]
        st = scores.T                                      # [BB, K] minor
        st = st - jnp.max(st, axis=1, keepdims=True)
        e = jnp.exp(st)
        w = e / jnp.sum(e, axis=1, keepdims=True)
        if use_mask:
            # the mask stays b-major [BB, K]: a (bb, K) block is legal (K ==
            # the full dim) where a (K, bb) one violates the lane-dim rule
            w = w * mask_ref[:]
            w = w / jnp.sum(w, axis=1, keepdims=True)
        # weighted sum over K, unrolled into K static aligned [BB, H] FMAs
        # (batched dot_general is rejected inside Mosaic kernels)
        acc = w[:, 0][:, None] * emb_ref[0].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + w[:, k][:, None] * emb_ref[k].astype(jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("block_b", "use_mask", "interpret"))
def _attention_pallas_kmajor(h, att_emb_t, p_att_t, w_h2att, b_h2att,
                             w_alpha, b_alpha, masks, use_mask: bool,
                             block_b: int = 64, interpret: bool = False):
    K, B, H = att_emb_t.shape
    A = p_att_t.shape[2]
    bb = _pick_block_b(B, K, H, A, block_b, att_emb_t.dtype.itemsize)
    grid = (B // bb,)
    in_specs = [
        pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, bb, H), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, bb, A), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((A, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [h, att_emb_t, p_att_t, w_h2att, b_h2att.reshape(1, -1), w_alpha,
            jnp.asarray(b_alpha).reshape(1, 1)]
    if use_mask:
        in_specs.append(pl.BlockSpec((bb, K), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(masks)
    return pl.pallas_call(
        _make_kernel_kmajor(use_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), h.dtype),
        interpret=interpret,
    )(*args)


def fused_attention_kmajor(h, att_emb_t, p_att_t, w_h2att, b_h2att, w_alpha,
                           b_alpha, masks):
    """Dispatch for the K-major layout (masks stay b-major [B, K]): Pallas
    on TPU (bf16 context), transpose-back reference elsewhere.  Decode-only
    (no custom_vjp — the training paths keep the b-major layout)."""
    if on_tpu() and att_emb_t.dtype == jnp.bfloat16:
        try:
            return _attention_pallas_kmajor(
                h, att_emb_t, p_att_t, w_h2att, b_h2att, w_alpha, b_alpha,
                masks, use_mask=masks is not None)
        except Exception as err:
            kernel_fallback("fused_attention_kmajor", err)
    return attention_reference_kmajor(h, att_emb_t, p_att_t, w_h2att,
                                      b_h2att, w_alpha, b_alpha, masks)
