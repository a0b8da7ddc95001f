"""Model wrapper: backbone + output activation flags.

Mirrors the reference wrapper (reference: modules/model/Gmidi_conform.py:22-43):
``sig`` applies sigmoid to the midi logits, ``softmax`` applies softmax over
bins; the boundary head is always sigmoided inside the backbone.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from some_tpu.nn.conformer import MidiConformer


class MidiExtractor(nn.Module):
    lay: int
    dim: int
    indim: int
    outdim: int
    use_lay_skip: bool = True
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

    def setup(self):
        self.backbone = MidiConformer(
            lay=self.lay, dim=self.dim, indim=self.indim, outdim=self.outdim,
            use_lay_skip=self.use_lay_skip, kernel_size=self.kernel_size,
            conv_drop=self.conv_drop, ffn_latent_drop=self.ffn_latent_drop,
            ffn_out_drop=self.ffn_out_drop, attention_drop=self.attention_drop,
            attention_heads=self.attention_heads,
            attention_heads_dim=self.attention_heads_dim,
            dtype=self.dtype, mask_attention=self.mask_attention,
            attn_impl=self.attn_impl, remat=self.remat,
            remat_policy=self.remat_policy, quant=self.quant,
            fuse_ffn=self.fuse_ffn,
        )

    def __call__(self, x, f0=None, mask: Optional[jnp.ndarray] = None,
                 softmax: bool = False, sig: bool = False,
                 deterministic: bool = True, use_running_average: bool = True):
        midi, bound = self.backbone(
            x, pitch=f0, mask=mask, deterministic=deterministic,
            use_running_average=use_running_average,
        )
        if sig:
            midi = nn.sigmoid(midi.astype(jnp.float32))
        if softmax:
            midi = nn.softmax(midi.astype(jnp.float32), axis=2)
        return midi, bound


def build_midi_extractor(config: dict, dtype=jnp.float32,
                         mask_attention: bool = True,
                         quantize: str | None = None) -> MidiExtractor:
    """Construct the flagship model from a SOME config dict.

    Pulls ``midi_extractor_args`` plus ``units_dim``/``midi_num_bins``
    (reference: modules/model/Gmidi_conform.py:26-28).

    ``quantize`` overrides the config's ``quantize`` key. Int8 is a
    SERVING-ONLY path (the activation round() has zero gradient — no
    straight-through estimator), so training tasks pass ``quantize="none"``
    explicitly and never build a quantized graph even if the work-dir config
    carries the serving key.
    """
    args = dict(config["midi_extractor_args"])
    args.pop("indim", None)
    args.pop("outdim", None)
    if quantize is None:
        quantize = str(config.get("quantize", "none"))
    return MidiExtractor(
        indim=config["units_dim"], outdim=config["midi_num_bins"],
        dtype=dtype, mask_attention=mask_attention,
        attn_impl=config.get("attention_impl", "auto"),
        remat=bool(config.get("use_remat", True)),
        remat_policy=str(config.get("remat_policy", "nothing")),
        quant=quantize,
        fuse_ffn=bool(config.get("fuse_ffn", False)), **args,
    )
