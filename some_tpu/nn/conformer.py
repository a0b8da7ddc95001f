"""Dual-stream conformer backbone (flax.linen).

Architecture parity with the reference backbone
(reference: modules/conform/Gconform.py, modules/attention/base_attention.py,
modules/conv/base_conv.py):

* ConformerBlock: macaron x0.5 FFN -> pre-norm MHSA -> conv module
  (pointwise->GLU->depthwise k=31->BatchNorm->SiLU->pointwise) -> x0.5 FFN
  -> final LayerNorm.
* DualStreamBlock: two parallel conformer blocks (midi / boundary streams)
  cross-injected through per-stream GLU gates
  (reference: modules/conform/Gconform.py:68-87).
* MidiConformer: per-stream input projections, N dual-stream layers with
  re-masking of the midi stream between layers, one extra conformer block per
  stream, then the midi head (dim->out bins) and the sigmoid boundary head
  (reference: modules/conform/Gconform.py:92-140). The ``pitch`` argument is
  accepted and unused, as in the reference (Gconform.py:119).

TPU-specific deltas (supersets of reference behavior, exact for unpadded
input):
* Attention optionally masks padded keys and the conv module zeroes padded
  frames before the depthwise conv. With an all-ones mask both are no-ops;
  with padding they make bucketed (padded) inference bit-equivalent to
  running each sequence unpadded — the reference never pads at inference so
  this reproduces its outputs under static XLA shapes.
* Computation runs in ``dtype`` (bf16 on TPU), parameters stay float32;
  softmax and normalization statistics are computed in float32.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


class QDense(nn.Module):
    """Dense with an optional int8 serving path.

    Identical parameter tree to flax ``nn.Dense`` (kernel [in, out] + bias),
    so checkpoints are unchanged. With ``quant='int8'`` the kernel entry of
    the supplied variables must already be int8 (see
    some_tpu.ops.quant.quantize_params) with the per-channel scale in the
    parallel ``qscales`` collection; activations are quantized dynamically
    and the matmul runs int8 x int8 -> int32 on the MXU (2x bf16 peak).
    """
    features: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.quant == "int8":
            from some_tpu.ops.quant import dynamic_int8_dense
            scale = self.variable(
                "qscales", "kernel_scale",
                lambda: jnp.ones((self.features,), jnp.float32))
            y = dynamic_int8_dense(x, kernel, scale.value, self.dtype)
        else:
            # same dtype promotion as flax nn.Dense(dtype=...): inputs and
            # params cast to dtype before the matmul (bit parity with r1)
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        return y + bias.astype(self.dtype)


class FeedForward(nn.Module):
    """dim -> 4*dim -> dim with SiLU (reference: Gconform.py:20-34)."""
    dim: int
    latent_drop: float = 0.1
    out_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = QDense(self.dim * 4, dtype=self.dtype, quant=self.quant,
                   name="fc1")(x)
        x = nn.silu(x)
        if self.latent_drop > 0:
            x = nn.Dropout(self.latent_drop, deterministic=deterministic)(x)
        x = QDense(self.dim, dtype=self.dtype, quant=self.quant,
                   name="fc2")(x)
        if self.out_drop > 0:
            x = nn.Dropout(self.out_drop, deterministic=deterministic)(x)
        return x


class _DenseParams(nn.Module):
    """Kernel+bias params in a named scope, tree-identical to nn.Dense /
    QDense — lets the fused-FFN path read fc1/fc2 weights without running
    the unfused modules."""
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.features_in, self.features_out), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features_out,), jnp.float32)
        return kernel, bias


class _FFNParams(nn.Module):
    """FeedForward's param tree (ffn scope with fc1/fc2 children)."""
    dim: int

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.dim, self.dim * 4, name="fc1")()
        fc2 = _DenseParams(self.dim * 4, self.dim, name="fc2")()
        return fc1, fc2


class _LNParams(nn.Module):
    """LayerNorm's param tree (scale/bias), for the fused path."""
    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return scale, bias


class _Kernel(nn.Module):
    """Bare kernel param in its own scope (tree-compatible with nn.Dense).

    With ``quant='int8'`` also exposes the per-output-channel scale variable
    so the attention block can share one activation quantization across the
    q and kv projections."""
    shape: tuple
    quant: str = "none"

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape, jnp.float32)
        if self.quant == "int8":
            scale = self.variable(
                "qscales", "kernel_scale",
                lambda: jnp.ones((self.shape[-1],), jnp.float32))
            return kernel, scale.value
        return kernel, None


class SelfAttention(nn.Module):
    """Bias-free q / fused-kv MHSA (reference: base_attention.py:8-46).

    ``attn_impl``: 'auto' (Pallas flash kernel on TPU when shapes allow,
    plain XLA otherwise), 'xla', or 'flash'. See some_tpu/ops/attention.py.
    """
    dim: int
    heads: int = 4
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        from some_tpu.ops.attention import (
            _xla_attention, can_use_flash, fused_attention_bhtd,
        )

        hidden = self.heads * self.head_dim
        B, T, C = x.shape
        # bias-free projections held as bare kernels (same tree paths and
        # shapes as nn.Dense: attn/{q_proj,kv_proj}/kernel [C, out]) so the
        # torch converter layout is unchanged, while the flash path can fold
        # the head-split transpose into the matmul output layout.
        q_kernel, q_scale = _Kernel((C, hidden), quant=self.quant,
                                    name="q_proj")()
        kv_kernel, kv_scale = _Kernel((C, hidden * 2), quant=self.quant,
                                      name="kv_proj")()
        scale = self.head_dim ** -0.5

        impl = self.attn_impl
        if impl == "auto":
            impl = "flash" if can_use_flash(T, self.head_dim) else "xla"

        if self.quant == "int8":
            # one dynamic activation quantization shared by q and kv
            from some_tpu.ops.quant import int8_matmul, quantize_activation
            xq, sx = quantize_activation(x)
            q = int8_matmul(xq, sx, q_kernel, q_scale, self.dtype)
            kv = int8_matmul(xq, sx, kv_kernel, kv_scale, self.dtype)
            q = q.reshape(B, T, self.heads, self.head_dim)
            k, v = jnp.split(kv, 2, axis=-1)
            k = k.reshape(B, T, self.heads, self.head_dim)
            v = v.reshape(B, T, self.heads, self.head_dim)
            if impl in ("flash", "splash"):
                out = fused_attention_bhtd(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                    jnp.swapaxes(v, 1, 2), mask, scale, impl)
                out = jnp.swapaxes(out, 1, 2)
            else:
                out = _xla_attention(q, k, v, mask, scale)
            out = out.astype(self.dtype).reshape(B, T, hidden)
        elif impl in ("flash", "splash"):
            qk = q_kernel.astype(self.dtype).reshape(C, self.heads, self.head_dim)
            kvk = kv_kernel.astype(self.dtype).reshape(
                C, 2, self.heads, self.head_dim)
            q = jnp.einsum("btc,chd->bhtd", x, qk)
            kv = jnp.einsum("btc,cshd->sbhtd", x, kvk)
            out = fused_attention_bhtd(q, kv[0], kv[1], mask, scale, impl)
            out = jnp.swapaxes(out.astype(self.dtype), 1, 2).reshape(B, T, hidden)
        else:
            q = (x @ q_kernel.astype(self.dtype)).reshape(
                B, T, self.heads, self.head_dim)
            k, v = jnp.split(x @ kv_kernel.astype(self.dtype), 2, axis=-1)
            k = k.reshape(B, T, self.heads, self.head_dim)
            v = v.reshape(B, T, self.heads, self.head_dim)
            out = _xla_attention(q, k, v, mask, scale)
            out = out.astype(self.dtype).reshape(B, T, hidden)
        return QDense(self.dim, dtype=self.dtype, quant=self.quant,
                      name="out_proj")(out)


class DepthwiseConv1d(nn.Module):
    """Per-channel temporal conv, kernel stored as [k, C] (torch [C,1,k].T).

    Dispatches to the Pallas VMEM-streaming kernel on TPU (XLA's grouped-conv
    lowering is ~35x off its memory bound at these shapes — see
    some_tpu/ops/depthwise.py)."""
    channels: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        from some_tpu.ops.depthwise import depthwise_conv1d

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, self.channels), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        y = depthwise_conv1d(x.astype(self.dtype), kernel.astype(self.dtype),
                             self.impl)
        return y + bias.astype(self.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, time) with optional frame masking.

    Same parameter/stat layout as flax BatchNorm (scale/bias params +
    mean/var batch_stats), so converted torch checkpoints load unchanged.
    Training-mode statistics exclude masked (padded) frames — the TPU
    bucketing adds fake rows/frames the reference's batches never had, and
    including them would skew the running stats (SURVEY.md §7.3 flags BN as
    the subtlest parity trap). Eval mode uses running stats and is exactly
    the reference's elementwise affine.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 use_running_average: bool = True):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is not None:
                w = mask.astype(jnp.float32)[..., None]
                count = jnp.maximum(w.sum(), 1.0)
                mean = (xf * w).sum(axis=(0, 1)) / count
                var = (((xf - mean) ** 2) * w).sum(axis=(0, 1)) / count
            else:
                count = jnp.asarray(xf.shape[0] * xf.shape[1], jnp.float32)
                mean = xf.mean(axis=(0, 1))
                var = xf.var(axis=(0, 1))
            if not self.is_initializing():
                # torch BatchNorm stores the UNBIASED variance in its running
                # stats (Bessel-corrected update) while normalizing with the
                # biased one; mirror that so checkpoints trained here eval
                # identically after conversion to torch/ONNX.
                var_unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var_unbiased)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class ConvModule(nn.Module):
    """pointwise->GLU->depthwise->BN->SiLU->pointwise (reference: base_conv.py:18-70)."""
    dim: int
    kernel_size: int = 31
    drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, use_running_average: bool = True):
        x = QDense(2 * self.dim, dtype=self.dtype, quant=self.quant,
                   name="pw1")(x)
        out, gate = jnp.split(x, 2, axis=-1)
        x = out * nn.sigmoid(gate)
        if mask is not None:
            # Padded frames become exact zeros, matching the implicit zero
            # padding the depthwise conv would see on an unpadded sequence.
            x = jnp.where(mask[..., None], x, 0)
        x = DepthwiseConv1d(self.dim, self.kernel_size, dtype=self.dtype, name="dw")(x)
        x = MaskedBatchNorm(momentum=0.9, epsilon=1e-5, name="bn")(
            x, mask=mask, use_running_average=use_running_average)
        x = nn.silu(x).astype(self.dtype)
        x = QDense(self.dim, dtype=self.dtype, quant=self.quant,
                   name="pw2")(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class ConformerBlock(nn.Module):
    """Macaron conformer block (reference: Gconform.py:37-63)."""
    dim: int
    kernel_size: int = 31
    conv_drop: float = 0.1
    ffn_latent_drop: float = 0.1
    ffn_out_drop: float = 0.1
    attention_drop: float = 0.1
    heads: int = 4
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    quant: str = "none"
    fuse_ffn: bool = False

    def _macaron_ffn(self, x, ffn_name: str, norm_name: str, deterministic):
        """x + 0.5 * FFN(LN(x)) — fused Pallas kernel when enabled.

        The fused path declares the SAME param tree (norm scale/bias +
        ffn fc1/fc2) through bare-param scopes, so checkpoints are shared
        with the unfused graph. Fusion is inference-only (dropout off;
        training needs the autodiff-able unfused graph)."""
        if self.fuse_ffn and deterministic and self.quant == "none":
            from some_tpu.ops.dispatch import portable
            from some_tpu.ops.fused_ffn import fused_ln_ffn_residual
            try:
                on_tpu = jax.devices()[0].platform == "tpu"
            except Exception:
                on_tpu = False
            (w1, b1), (w2, b2) = _FFNParams(self.dim, name=ffn_name)()
            g, b = _LNParams(self.dim, name=norm_name)()
            return fused_ln_ffn_residual(
                x, g, b, w1, b1, w2, b2, res_scale=0.5,
                interpret=not (on_tpu and not portable()))
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=norm_name)
        return FeedForward(self.dim, self.ffn_latent_drop, self.ffn_out_drop,
                           dtype=self.dtype, quant=self.quant, name=ffn_name)(
            ln(x), deterministic) * 0.5 + x

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, use_running_average: bool = True):
        # LayerNorm statistics are always f32 inside flax (_compute_stats
        # upcasts); dtype=self.dtype keeps the normalized tensor in compute
        # precision instead of materializing f32 copies around every norm.
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = self._macaron_ffn(x, "ffn1", "norm1", deterministic)
        att = SelfAttention(self.dim, self.heads, self.head_dim,
                            dtype=self.dtype, attn_impl=self.attn_impl,
                            quant=self.quant, name="attn")(
            ln("norm2")(x), mask=mask)
        if self.attention_drop > 0:
            att = nn.Dropout(self.attention_drop, deterministic=deterministic)(att)
        # named checkpoints: inert under the default full-block remat, but
        # remat_policy "save_attn_conv" saves these dim-wide tensors (64 MB
        # at the flagship 65k-frame budget vs the 256 MB FFN hiddens it
        # still recomputes) so the backward skips re-running attention and
        # the conv module — the two costliest non-FFN forwards in the block
        from jax.ad_checkpoint import checkpoint_name
        att = checkpoint_name(att, "attn_out")
        x = att + x
        cv = ConvModule(self.dim, self.kernel_size, self.conv_drop,
                        dtype=self.dtype, quant=self.quant, name="conv")(
            ln("norm3")(x), mask=mask,
            deterministic=deterministic, use_running_average=use_running_average)
        x = checkpoint_name(cv, "conv_out") + x
        x = self._macaron_ffn(x, "ffn2", "norm4", deterministic)
        return ln("norm5")(x)


class DualStreamBlock(nn.Module):
    """Two conformer streams + GLU cross-injection (reference: Gconform.py:68-87)."""
    dim: int
    kernel_size: int = 31
    conv_drop: float = 0.1
    ffn_latent_drop: float = 0.1
    ffn_out_drop: float = 0.1
    attention_drop: float = 0.1
    heads: int = 4
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    quant: str = "none"
    fuse_ffn: bool = False

    @nn.compact
    def __call__(self, midi, bound, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, use_running_average: bool = True):
        kwargs = dict(mask=mask, deterministic=deterministic,
                      use_running_average=use_running_average)
        block_args = dict(
            dim=self.dim, kernel_size=self.kernel_size, conv_drop=self.conv_drop,
            ffn_latent_drop=self.ffn_latent_drop, ffn_out_drop=self.ffn_out_drop,
            attention_drop=self.attention_drop, heads=self.heads,
            head_dim=self.head_dim, dtype=self.dtype, attn_impl=self.attn_impl,
            quant=self.quant, fuse_ffn=self.fuse_ffn,
        )
        midi = ConformerBlock(**block_args, name="midi_block")(midi, **kwargs)
        bound = ConformerBlock(**block_args, name="bound_block")(bound, **kwargs)

        def glu_gate(name, x):
            y = QDense(self.dim * 2, dtype=self.dtype, quant=self.quant,
                       name=name)(x)
            out, gate = jnp.split(y, 2, axis=-1)
            return out * nn.sigmoid(gate)

        midi_msg = glu_gate("midi_gate", midi)    # reference glu1(midi)
        bound_msg = glu_gate("bound_gate", bound)  # reference glu2(bound)
        return midi + bound_msg, bound + midi_msg


class MidiConformer(nn.Module):
    """Backbone: in-projections, N dual-stream layers, heads.

    Returns (midi_logits [B, T, outdim], bound_prob [B, T]); the boundary
    head applies sigmoid internally (reference: Gconform.py:135-140).
    """
    lay: int
    dim: int
    indim: int
    outdim: int
    use_lay_skip: bool = True  # stored but unused, as in the reference
    kernel_size: int = 31
    conv_drop: float = 0.1
    ffn_latent_drop: float = 0.1
    ffn_out_drop: float = 0.1
    attention_drop: float = 0.1
    attention_heads: int = 4
    attention_heads_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    mask_attention: bool = True
    attn_impl: str = "auto"
    remat: bool = True
    remat_policy: str = "nothing"
    quant: str = "none"
    fuse_ffn: bool = False

    @nn.compact
    def __call__(self, x, pitch=None, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, use_running_average: bool = True):
        del pitch  # accepted but unused (reference: Gconform.py:119)
        attn_mask = mask if (self.mask_attention and mask is not None) else None
        block_args = dict(
            dim=self.dim, kernel_size=self.kernel_size, conv_drop=self.conv_drop,
            ffn_latent_drop=self.ffn_latent_drop, ffn_out_drop=self.ffn_out_drop,
            attention_drop=self.attention_drop, heads=self.attention_heads,
            head_dim=self.attention_heads_dim, dtype=self.dtype,
            attn_impl=self.attn_impl, quant=self.quant,
            fuse_ffn=self.fuse_ffn,
        )
        kwargs = dict(mask=attn_mask, deterministic=deterministic,
                      use_running_average=use_running_average)

        x = x.astype(self.dtype)
        midi = nn.Dense(self.dim, dtype=self.dtype, name="in_proj_midi")(x)
        bound = nn.Dense(self.dim, dtype=self.dtype, name="in_proj_bound")(x)
        if mask is not None:
            midi = jnp.where(mask[..., None], midi, 0)
        # Rematerialize each dual-stream layer on the backward pass: without
        # it the 8x512 model's training activations exceed v5e HBM at the
        # reference's 80k-frame batch budget (jax.checkpoint trades ~1/3
        # recompute for O(layers) -> O(1) activation memory per layer).
        block_cls = DualStreamBlock
        if self.remat:
            # remat_policy trades backward-pass recompute against HBM:
            #   nothing  — recompute the whole layer (min memory, ~1/3 extra
            #              fwd FLOPs; fits the reference 80k-frame budget)
            #   dots     — save matmul outputs, recompute elementwise only
            #              (jax.checkpoint_policies.checkpoint_dots).
            #              MEASURED DEAD-END at flagship geometry: it saves
            #              the bf16[32,2048,2048] FFN hiddens (256 MB x 8
            #              layers x 2 streams x 2 FFNs ~ 8 GB) and OOMs
            #              (BENCH_NOTES round-4 train attribution)
            #   dots_no_batch — save only non-batch matmuls (weights-side)
            #   save_attn_conv — save the named attention/conv outputs
            #              (dim-wide, 64 MB each at flagship) and recompute
            #              only the FFN/norm legs in the backward: the
            #              middle ground "dots" cannot express
            policy = {
                "nothing": None,
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "dots_no_batch":
                    jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                "save_attn_conv":
                    jax.checkpoint_policies.save_only_these_names(
                        "attn_out", "conv_out"),
            }[self.remat_policy]
            block_cls = nn.remat(DualStreamBlock, static_argnums=(4, 5),
                                 policy=policy)
        for i in range(self.lay):
            midi, bound = block_cls(**block_args, name=f"layer_{i}")(
                midi, bound, mask, kwargs["deterministic"],
                kwargs["use_running_average"])
            if mask is not None:
                midi = jnp.where(mask[..., None], midi, 0)
        midi = ConformerBlock(**block_args, name="final_midi")(midi, **kwargs)
        bound = ConformerBlock(**block_args, name="final_bound")(bound, **kwargs)

        midi_logits = nn.Dense(self.outdim, dtype=self.dtype, name="out_proj")(midi)
        bound_logit = nn.Dense(1, dtype=self.dtype, name="bound_head")(bound)
        bound_prob = nn.sigmoid(bound_logit.astype(jnp.float32)).squeeze(-1)
        return midi_logits, bound_prob
