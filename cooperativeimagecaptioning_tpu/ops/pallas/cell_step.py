"""Fused maxout-LSTM cell (Att2in2 / FC variants).

One decode step's gate math as a single kernel: the XLA graph materializes the
[B, 5H] f32 gate pre-activations (and the [B, 2H] a2c sum) in HBM between the
matmuls and the elementwise ops; here they live in VMEM and only (h', c') leave
the kernel.

    sums = xt @ Wi + bi + h @ Wh + bh                     (MXU)
    i, f, o = sigmoid(sums[:3H]);
    g = max(sums[3H:4H] (+ a2c[:H]), sums[4H:5H] (+ a2c[H:]))
    c' = f*c + i*g ; h' = o*tanh(c')
(ref: AttModel.py:514-527 Att2in2Core; FCModel.py:26-42 LSTMCore)

custom_vjp recomputes the pure-JAX reference for gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cooperativeimagecaptioning_tpu.ops.pallas._dispatch import (
    kernel_fallback, on_tpu)


def cell_reference(xt, h, c, att_res, wi, bi, wh, bh, wc, bc):
    """Pure-JAX semantics.  att_res/wc/bc may be None (FC cell)."""
    H = h.shape[-1]
    # grouping matches i2h(xt) + h2h(h) for exact float parity with the ref
    sums = (xt @ wi + bi) + (h @ wh + bh)
    sig = jax.nn.sigmoid(sums[:, :3 * H])
    in_gate, forget_gate, out_gate = (sig[:, :H], sig[:, H:2 * H],
                                      sig[:, 2 * H:3 * H])
    it = sums[:, 3 * H:5 * H]
    if att_res is not None:
        it = it + att_res @ wc + bc
    g = jnp.maximum(it[:, :H], it[:, H:2 * H])
    c_new = forget_gate * c + in_gate * g
    h_new = out_gate * jnp.tanh(c_new)
    return h_new, c_new


def _make_kernel(use_att: bool, H: int):
    def kernel(*refs):
        if use_att:
            (xt_ref, h_ref, c_ref, ar_ref, wi_ref, bi_ref, wh_ref, bh_ref,
             wc_ref, bc_ref, hout_ref, cout_ref) = refs
        else:
            (xt_ref, h_ref, c_ref, wi_ref, bi_ref, wh_ref, bh_ref,
             hout_ref, cout_ref) = refs
        sums = ((jnp.dot(xt_ref[:], wi_ref[:],
                         preferred_element_type=jnp.float32) + bi_ref[:]) +
                (jnp.dot(h_ref[:], wh_ref[:],
                         preferred_element_type=jnp.float32) + bh_ref[:]))
        sig = jax.nn.sigmoid(sums[:, :3 * H])
        it = sums[:, 3 * H:5 * H]
        if use_att:
            it = it + jnp.dot(ar_ref[:], wc_ref[:],
                              preferred_element_type=jnp.float32) + bc_ref[:]
        g = jnp.maximum(it[:, :H], it[:, H:2 * H])
        c_new = sig[:, H:2 * H] * c_ref[:].astype(jnp.float32) + \
            sig[:, :H] * g
        h_new = sig[:, 2 * H:3 * H] * jnp.tanh(c_new)
        hout_ref[:] = h_new.astype(hout_ref.dtype)
        cout_ref[:] = c_new.astype(cout_ref.dtype)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("use_att", "block_b", "interpret"))
def _cell_pallas(xt, h, c, att_res, wi, bi, wh, bh, wc, bc, use_att: bool,
                 block_b: int = 128, interpret: bool = False):
    B, D = xt.shape
    H = h.shape[-1]
    bb = min(block_b, B)
    while B % bb:
        bb //= 2
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=vm),
    ]
    args = [xt, h, c]
    if use_att:
        in_specs.append(pl.BlockSpec((bb, H), lambda i: (i, 0),
                                     memory_space=vm))
        args.append(att_res)
    in_specs += [
        pl.BlockSpec((D, 5 * H), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, 5 * H), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((H, 5 * H), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, 5 * H), lambda i: (0, 0), memory_space=vm),
    ]
    args += [wi, bi.reshape(1, -1), wh, bh.reshape(1, -1)]
    if use_att:
        in_specs += [
            pl.BlockSpec((H, 2 * H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, 2 * H), lambda i: (0, 0), memory_space=vm),
        ]
        args += [wc, bc.reshape(1, -1)]
    return pl.pallas_call(
        _make_kernel(use_att, H),
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((bb, H), lambda i: (i, 0), memory_space=vm),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H), h.dtype),
                   jax.ShapeDtypeStruct((B, H), h.dtype)],
        interpret=interpret,
    )(*args)


@jax.custom_vjp
def fused_cell(xt, h, c, att_res, wi, bi, wh, bh, wc, bc):
    """Dispatch.  att_res/wc/bc None = FC variant.

    Measured on v5e: XLA already fuses the gate elementwise chain into the two
    matmuls well enough that the Pallas cell is a slight net loss on the decode
    path (176k vs 183k captions/s with it off), so it is opt-in via
    CIC_FUSED_CELL=1 pending per-shape tuning."""
    import os
    if os.environ.get("CIC_FUSED_CELL") == "1" and on_tpu():
        try:
            return _cell_pallas(xt, h, c, att_res, wi, bi, wh, bh, wc, bc,
                                use_att=att_res is not None)
        except Exception as err:
            kernel_fallback("fused_cell", err)
    return cell_reference(xt, h, c, att_res, wi, bi, wh, bh, wc, bc)


def _fwd(*args):
    return fused_cell(*args), args


def _bwd(args, g):
    _, vjp = jax.vjp(cell_reference, *args)
    return vjp(tuple(g))


fused_cell.defvjp(_fwd, _bwd)
