"""Pallas TPU kernel: fused LayerNorm -> FFN -> scaled residual.

The macaron FFN (reference: Gconform.py:20-34, used twice per conformer
block at Gconform.py:47/61) is the model's largest matmul consumer — 36
instances of ``x + 0.5 * fc2(silu(fc1(LN(x))))`` per forward. Unfused, each
instance moves the [N, D] activation through HBM five times (LN read/write,
fc1 read, intermediate write/read, fc2 write, residual read). This kernel
keeps a row-block resident in VMEM across the whole chain: HBM traffic drops
to one x read + one y write + the (grid-invariant, pipeline-cached) weights.

Inference-only fast path: training keeps the unfused XLA graph (which autodiff
knows how to reverse); the engine enables fusion via ``fuse_ffn: true``.
Numerics: LN statistics in f32, matmuls bf16 x bf16 with f32 accumulation,
silu in f32 — the same precision contract as the unfused path, so outputs
match to bf16 rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, *, eps: float, res_scale: float):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    dt = x_ref.dtype  # compute dtype (bf16 in production, f32 keeps parity)
    h = jnp.dot(ln.astype(dt), w1_ref[...],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)  # silu in f32
    y = jnp.dot(h.astype(dt), w2_ref[...],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    out_ref[...] = (y * res_scale + xf).astype(out_ref.dtype)


def fused_ln_ffn_residual(x: jnp.ndarray, ln_scale, ln_bias, w1, b1, w2, b2,
                          eps: float = 1e-5, res_scale: float = 0.5,
                          block_n: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """x [B, T, D] -> x + res_scale * FFN(LN(x)); one VMEM-resident pass.

    Weights ride constant BlockSpecs (index_map -> block 0), which the Pallas
    pipeline keeps resident across grid steps instead of re-DMAing.
    """
    B, T, D = x.shape
    H = w1.shape[-1]
    n = B * T
    if block_n is None:
        block_n = next((c for c in (256, 128, 64, 32, 16, 8) if n % c == 0), n)
    assert n % block_n == 0, (n, block_n)
    x2 = x.reshape(n, D)

    const = lambda *_: (0, 0)
    vec = lambda *_: (0,)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps, res_scale=res_scale),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, D), x.dtype),
        interpret=interpret,
    )(x2, ln_scale, ln_bias, w1.astype(x.dtype), b1,
      w2.astype(x.dtype), b2)
    return out.reshape(B, T, D)
