"""Attention dispatch: plain XLA einsum path or fused Pallas flash kernel.

The conformer's bidirectional full attention is the memory hot spot at long
buckets (scores are O(T^2) per head in the XLA path). On TPU the Pallas
flash-attention kernel streams K/V blocks through VMEM with an online
softmax, never materializing [T, T] — the reference instead relies on
torch SDPA flash kernels (reference: modules/attention/base_attention.py:41-43).

Key-padding semantics: bucketed inference needs padded keys excluded for
real queries. The flash path encodes this via segment ids (pad frames get
segment 0, real frames segment 1 — attention only within equal segments),
matching the -inf key-mask bias of the XLA path for real rows.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _xla_attention(q, k, v, mask, scale):
    """q,k,v: [B, T, H, D]; mask: [B, T] bool or None."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_block_sizes(t: int):
    import os

    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    def divisor_block(limit):
        for cand in (limit, limit // 2, limit // 4, 256, 128):
            if cand and cand <= t and t % cand == 0:
                return cand
        return t

    # env overrides let the block-size sweep (tools/profile_attention.py)
    # run against the real model without code edits. Defaults measured on
    # v5e at T=1024 (BENCH_NOTES.md round 2): bq=1024 beats 512 by ~1.5%;
    # splash was ~4% slower than this legacy kernel at the same shapes.
    block_q = divisor_block(int(os.environ.get("SOME_FLASH_BQ", 1024)))
    block_k = divisor_block(int(os.environ.get("SOME_FLASH_BK", 1024)))
    return BlockSizes(
        block_q=block_q, block_k_major=block_k, block_k=block_k, block_b=1,
        block_q_major_dkv=block_q, block_k_major_dkv=block_k,
        block_k_dkv=block_k, block_q_dkv=block_q,
        block_k_major_dq=block_k, block_k_dq=block_k, block_q_dq=block_q,
    )


def _flash_attention_bhtd(q, k, v, mask, scale):
    """Pallas TPU kernel; q,k,v already [B, H, T, D] -> [B, H, T, D]."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention,
    )

    segment_ids = None
    if mask is not None:
        ids = mask.astype(jnp.int32)  # pad=0, real=1: cross-attention blocked
        segment_ids = SegmentIds(q=ids, kv=ids)
    return flash_attention(q, k, v, segment_ids=segment_ids,
                           causal=False, sm_scale=scale,
                           block_sizes=_flash_block_sizes(q.shape[2]))


@functools.lru_cache(maxsize=16)
def _splash_kernel(heads: int, t: int, block_q: int, block_kv: int):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm,
    )

    mh_mask = sm.MultiHeadMask([sm.FullMask((t, t)) for _ in range(heads)])
    block_sizes = sk.BlockSizes(
        block_q=block_q, block_kv=block_kv, block_kv_compute=block_kv,
        block_q_dkv=block_q, block_kv_dkv=block_kv,
        block_kv_dkv_compute=block_kv,
        block_q_dq=block_q, block_kv_dq=block_kv,
    )
    return sk.make_splash_mha(mh_mask, block_sizes=block_sizes,
                              head_shards=1, q_seq_shards=1)


def _splash_attention_bhtd(q, k, v, mask, scale):
    """Splash-attention kernel (newer-generation TPU flash); q,k,v [B,H,T,D].

    Splash takes no sm_scale — q is pre-scaled. Padded keys are excluded via
    per-batch segment ids exactly like the legacy flash path.
    """
    import os

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
    )

    B, H, T, D = q.shape
    block_q = min(int(os.environ.get("SOME_SPLASH_BQ", 512)), T)
    block_kv = min(int(os.environ.get("SOME_SPLASH_BK", 1024)), T)
    # kernel construction precomputes mask-info arrays; build them eagerly
    # (compile-time) so they do not become tracers of the enclosing jit that
    # then leak through the lru_cache into later traces
    with jax.ensure_compile_time_eval():
        kernel = _splash_kernel(H, T, block_q, block_kv)
    qs = (q * scale).astype(q.dtype)
    if mask is not None:
        ids = mask.astype(jnp.int32)
        out = jax.vmap(
            lambda qb, kb, vb, ib: kernel(
                qb, kb, vb, segment_ids=sk.SegmentIds(q=ib, kv=ib))
        )(qs, k, v, ids)
    else:
        out = jax.vmap(lambda qb, kb, vb: kernel(qb, kb, vb))(qs, k, v)
    return out.astype(q.dtype)


def _flash_attention(q, k, v, mask, scale):
    """q,k,v [B, T, H, D] -> [B, T, H, D] (transposing wrapper)."""
    out = _flash_attention_bhtd(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                                jnp.swapaxes(v, 1, 2), mask, scale)
    return jnp.swapaxes(out, 1, 2)


def can_use_flash(t: int, head_dim: int) -> bool:
    """Shipped kernel wants the sequence on a 128 grid and lane-sized heads."""
    from some_tpu.ops.dispatch import portable
    if portable():
        return False  # multi-platform export: Pallas can't lower for CPU
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform == "tpu" and t % 128 == 0 and head_dim % 8 == 0 and t >= 256


def fused_attention_bhtd(q, k, v, mask, scale, impl: str):
    """[B,H,T,D] kernel dispatch: 'flash' (legacy) or 'splash'."""
    fn = _splash_attention_bhtd if impl == "splash" else _flash_attention_bhtd
    return fn(q, k, v, mask, scale)


def dot_product_attention(q, k, v, mask: Optional[jnp.ndarray] = None,
                          impl: str = "auto"):
    """q,k,v: [B, T, H, D]; mask: [B, T] bool key/query validity."""
    scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = "flash" if can_use_flash(q.shape[1], q.shape[-1]) else "xla"
    if impl in ("flash", "splash"):
        out = fused_attention_bhtd(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), mask, scale, impl)
        return jnp.swapaxes(out, 1, 2)
    return _xla_attention(q, k, v, mask, scale)
