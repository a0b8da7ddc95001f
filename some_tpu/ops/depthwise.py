"""Pallas TPU kernel: depthwise temporal convolution (the conformer's k=31).

XLA lowers ``feature_group_count=C`` 1-D convs poorly on TPU (measured
~2.9 ms for [8, 4096, 512] k=31 bf16 — ~35x worse than its HBM-traffic bound).
This kernel streams the sequence once through VMEM: each grid step reads two
pipelined block views (block t plus block t+1 for the halo — Pallas
double-buffers their DMAs automatically), accumulates the k taps as VPU
fused multiply-adds in f32, and writes [block_t, C] back.

Training uses a custom VJP: dx is the same kernel with time-flipped weights
(correlation <-> convolution duality), dw reduces x-window x dy products per
tap (k tiny, XLA handles it well).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(cur_ref, nxt_ref, w_ref, out_ref, scratch, *,
               k: int, block_t: int, halo: int):
    """Two pipelined VMEM views (block t and t+1) provide the halo; the
    Pallas grid pipeline double-buffers their DMAs automatically, unlike a
    manual copy.start/wait pair which serializes DMA latency per step."""
    scratch[:block_t, :] = cur_ref[0]
    scratch[block_t:, :] = nxt_ref[0, :halo, :]
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for tap in range(k):
        acc += scratch[tap:tap + block_t, :].astype(jnp.float32) * \
            w_ref[tap, :].astype(jnp.float32)
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _pallas_depthwise_strided(x: jnp.ndarray, w: jnp.ndarray,
                              block_t: int = 512,
                              interpret: bool = False) -> jnp.ndarray:
    B, T, C = x.shape
    k = w.shape[0]
    half = (k - 1) // 2
    halo = ((k - 1 + 7) // 8) * 8
    # left-shift by half so y[i] reads rows [i, i+k); one extra block of
    # zeros at the end keeps the (t+1) view in bounds on the last step
    x_pad = jnp.pad(x, ((0, 0), (half, (block_t + halo) - half), (0, 0)))

    grid = (B, T // block_t)
    return pl.pallas_call(
        functools.partial(_dw_kernel, k=k, block_t=block_t, halo=halo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, C), lambda b, t: (b, t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_t + halo, C), x.dtype),
        ],
        interpret=interpret,
    )(x_pad, x_pad, w)


def _xla_depthwise(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    C = x.shape[-1]
    # Precision.HIGHEST: XLA's DEFAULT on TPU truncates f32 conv operands to
    # bf16 on the MXU (~6e-3 relative error), while the Pallas kernel does
    # true f32 VPU FMAs — the two paths must agree (and a k=31 depthwise conv
    # is bandwidth-bound, so exact f32 costs nothing). bf16 model dtype is
    # unaffected.
    return jax.lax.conv_general_dilated(
        x, w[:, None, :], window_strides=(1,), padding="SAME",
        feature_group_count=C, dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST)


def _choose_block_t(T: int) -> int:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if T % cand == 0:
            return cand
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray, impl: str = "auto"):
    """Depthwise temporal conv, 'SAME' zero padding. x [B,T,C], w [k,C].

    k must be odd (symmetric halo; the backward pass reuses the forward
    kernel with flipped taps, which requires half == k - 1 - half).
    """
    assert w.shape[0] % 2 == 1, "depthwise kernel size must be odd"
    return _forward(x, w, impl)


def _forward(x, w, impl):
    if impl == "auto":
        from some_tpu.ops.dispatch import portable
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        block_t = _choose_block_t(x.shape[1])
        impl = "pallas" if (on_tpu and block_t >= 64 and not portable()) \
            else "xla"
    if impl.startswith("pallas"):
        return _pallas_depthwise_strided(
            x, w, block_t=_choose_block_t(x.shape[1]),
            interpret=impl == "pallas_interpret")
    return _xla_depthwise(x, w)


def _fwd(x, w, impl):
    return _forward(x, w, impl), (x, w)


def _bwd(impl, res, g):
    x, w = res
    # dx: correlate g with time-flipped taps (same depthwise kernel)
    dx = _forward(g, w[::-1], impl)
    # dw[tap, c] = sum_{b,t} x_pad[b, t + tap, c] * g[b, t, c]
    k = w.shape[0]
    half = (k - 1) // 2
    x_pad = jnp.pad(x, ((0, 0), (half, k - 1 - half), (0, 0)))
    T = x.shape[1]
    taps = [jnp.sum(x_pad[:, tap:tap + T, :].astype(jnp.float32)
                    * g.astype(jnp.float32), axis=(0, 1)) for tap in range(k)]
    dw = jnp.stack(taps).astype(w.dtype)
    return dx, dw


depthwise_conv1d.defvjp(_fwd, _bwd)
