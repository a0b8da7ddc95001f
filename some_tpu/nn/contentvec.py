"""ContentVec / HuBERT-base units encoder in JAX.

The reference wraps a fairseq HuBERT ensemble and takes layer-9 features
(reference: modules/contentvec/__init__.py:5-24). fairseq isn't part of this
image, so the forward is implemented natively:

  waveform 16 kHz -> 7-layer strided conv feature extractor (512 ch,
  GroupNorm on the first layer, exact GELU) -> feature LayerNorm ->
  512->768 projection -> +relative positional conv (kernel 128, 16 groups,
  SamePad trim) -> encoder LayerNorm (post-norm architecture) -> N
  post-norm transformer layers -> features after ``output_layer`` layers.

Checkpoint loading: ``load_fairseq_checkpoint`` tolerantly unpickles the
published fairseq .pt (stubbing fairseq-internal classes) and maps weights;
``convert_transformers_state_dict`` maps a Hugging Face HubertModel state
dict (used as the numeric parity oracle in tests).
"""
from __future__ import annotations

import pathlib
import pickle
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# HuBERT-base geometry
CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 3, 2), (512, 2, 2), (512, 2, 2),
)  # (dim, kernel, stride)
EMBED_DIM = 768
NUM_LAYERS = 12
NUM_HEADS = 12
FFN_DIM = 3072
POS_CONV_KERNEL = 128
POS_CONV_GROUPS = 16


class _MaskedGroupNorm(nn.Module):
    """GroupNorm with num_groups == channels (per-channel stats over TIME,
    matching torch GroupNorm(512, 512) on [B, C, T]) that can exclude padded
    tail frames from the statistics — zero-padding the waveform then changes
    nothing for real frames. Parameter tree identical to nn.GroupNorm."""
    channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, n_real=None):  # x: [B, T, C]
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if n_real is None:
            w = jnp.ones(x.shape[:2], x.dtype)
        else:
            w = (jnp.arange(x.shape[1]) < n_real).astype(x.dtype)[None, :]
        denom = jnp.maximum(w.sum(1, keepdims=True), 1.0)[..., None]
        mean = (x * w[..., None]).sum(1, keepdims=True) / denom
        var = (jnp.square(x - mean) * w[..., None]).sum(1, keepdims=True) / denom
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class FeatureExtractor(nn.Module):
    """[B, S] waveform -> [B, T, 512].

    ``n_real0``: number of REAL frames after conv_0 when the waveform is
    zero-padded to a shape bucket; only the GroupNorm statistics need it —
    every later VALID conv's real output frame reads only real input frames.
    """
    conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS

    @nn.compact
    def __call__(self, x, n_real0=None):
        x = x[:, :, None]  # NWC
        for i, (dim, kernel, stride) in enumerate(self.conv_layers):
            x = nn.Conv(dim, (kernel,), strides=(stride,), padding="VALID",
                        use_bias=False, name=f"conv_{i}")(x)
            if i == 0:
                x = _MaskedGroupNorm(dim, name="group_norm")(x, n_real0)
            x = jax.nn.gelu(x, approximate=False)
        return x


class TransformerLayer(nn.Module):
    """Post-norm encoder layer (fairseq layer_norm_first=False)."""
    heads: int = NUM_HEADS
    ffn_dim: int = FFN_DIM

    @nn.compact
    def __call__(self, x, key_mask=None):
        dim = x.shape[-1]
        head_dim = dim // self.heads
        residual = x
        q = nn.Dense(dim, name="q_proj")(x) * head_dim ** -0.5
        k = nn.Dense(dim, name="k_proj")(x)
        v = nn.Dense(dim, name="v_proj")(x)
        B, T = x.shape[0], x.shape[1]
        q = q.reshape(B, T, self.heads, head_dim)
        k = k.reshape(B, T, self.heads, head_dim)
        v = v.reshape(B, T, self.heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if key_mask is not None:  # [B, T] True on real frames
            scores = jnp.where(key_mask[:, None, None, :], scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, T, dim)
        x = residual + nn.Dense(dim, name="out_proj")(att)
        x = nn.LayerNorm(epsilon=1e-5, name="attn_norm")(x)

        residual = x
        h = jax.nn.gelu(nn.Dense(self.ffn_dim, name="fc1")(x), approximate=False)
        x = residual + nn.Dense(dim, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)


class HubertEncoder(nn.Module):
    """Full units encoder; returns features after ``output_layer`` layers."""
    output_layer: int = 9
    num_layers: int = NUM_LAYERS
    conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS
    embed_dim: int = EMBED_DIM
    heads: int = NUM_HEADS
    ffn_dim: int = FFN_DIM
    pos_conv_kernel: int = POS_CONV_KERNEL
    pos_conv_groups: int = POS_CONV_GROUPS

    @nn.compact
    def __call__(self, waveform, n_real0=None, n_real=None):
        """``n_real0``/``n_real``: real frame counts after conv_0 / at the
        encoder grid when ``waveform`` is zero-padded to a shape bucket.
        With both given, real-frame outputs are EXACTLY the unpadded
        forward's (masked GroupNorm stats, zeroed padding before the
        positional conv, masked attention keys); padded tail frames are
        garbage the caller crops."""
        feats = FeatureExtractor(self.conv_layers, name="feature_extractor")(
            waveform, n_real0)
        feats = nn.LayerNorm(epsilon=1e-5, name="feature_norm")(feats)
        x = nn.Dense(self.embed_dim, name="post_proj")(feats)
        frame_mask = None
        if n_real is not None:
            frame_mask = jnp.arange(x.shape[1]) < n_real  # [T]
            frame_mask = jnp.broadcast_to(frame_mask[None], x.shape[:2])
            # zero padded frames so the positional conv's receptive field
            # sees exactly the implicit zeros an unpadded forward would
            x = jnp.where(frame_mask[..., None], x, 0)

        # relative positional conv (weight-norm folded at conversion time)
        pos_kernel = self.param(
            "pos_conv_kernel", nn.initializers.lecun_normal(),
            (self.pos_conv_kernel, self.embed_dim // self.pos_conv_groups,
             self.embed_dim), jnp.float32)
        pos_bias = self.param("pos_conv_bias", nn.initializers.zeros,
                              (self.embed_dim,), jnp.float32)
        pos = jax.lax.conv_general_dilated(
            x, pos_kernel, window_strides=(1,),
            padding=((self.pos_conv_kernel // 2, self.pos_conv_kernel // 2),),
            feature_group_count=self.pos_conv_groups,
            dimension_numbers=("NWC", "WIO", "NWC")) + pos_bias
        if self.pos_conv_kernel % 2 == 0:
            pos = pos[:, :-1]  # SamePad trim for even kernel
        x = x + jax.nn.gelu(pos, approximate=False)
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_norm")(x)

        for i in range(min(self.output_layer, self.num_layers)):
            x = TransformerLayer(self.heads, self.ffn_dim, name=f"layer_{i}")(
                x, frame_mask)
        return x


# ------------------------------------------------------------- converters
def _put(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value, dtype=np.float32)


def _fold_weight_norm(weight_g, weight_v):
    """torch weight_norm(conv, dim=2): w = g * v / ||v||_dims(0,1)."""
    norm = np.linalg.norm(weight_v, axis=(0, 1), keepdims=True)
    return weight_g * weight_v / norm


def convert_fairseq_state_dict(sd: dict, output_layer: int = 9) -> dict:
    """fairseq HubertModel state dict -> flax variables."""
    p: dict = {}
    for i in range(len(CONV_LAYERS)):
        w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]  # [out,in,k]
        _put(p, ("feature_extractor", f"conv_{i}", "kernel"),
             np.transpose(w, (2, 1, 0)))
        if i == 0:
            _put(p, ("feature_extractor", "group_norm", "scale"),
                 sd["feature_extractor.conv_layers.0.2.weight"])
            _put(p, ("feature_extractor", "group_norm", "bias"),
                 sd["feature_extractor.conv_layers.0.2.bias"])
    _put(p, ("feature_norm", "scale"), sd["layer_norm.weight"])
    _put(p, ("feature_norm", "bias"), sd["layer_norm.bias"])
    _put(p, ("post_proj", "kernel"), np.transpose(sd["post_extract_proj.weight"]))
    _put(p, ("post_proj", "bias"), sd["post_extract_proj.bias"])

    # pos conv: torch [out, in/groups, k] with weight norm over (g-dim 2)
    wg = np.asarray(sd["encoder.pos_conv.0.weight_g"], dtype=np.float32)
    wv = np.asarray(sd["encoder.pos_conv.0.weight_v"], dtype=np.float32)
    w = _fold_weight_norm(wg, wv)  # [out, in/groups, k]
    _put(p, ("pos_conv_kernel",), np.transpose(w, (2, 1, 0)))
    _put(p, ("pos_conv_bias",), sd["encoder.pos_conv.0.bias"])
    _put(p, ("encoder_norm", "scale"), sd["encoder.layer_norm.weight"])
    _put(p, ("encoder_norm", "bias"), sd["encoder.layer_norm.bias"])

    for i in range(output_layer):
        t = f"encoder.layers.{i}"
        layer = (f"layer_{i}",)
        for src, dst in (("self_attn.q_proj", "q_proj"),
                         ("self_attn.k_proj", "k_proj"),
                         ("self_attn.v_proj", "v_proj"),
                         ("self_attn.out_proj", "out_proj"),
                         ("fc1", "fc1"), ("fc2", "fc2")):
            _put(p, layer + (dst, "kernel"), np.transpose(sd[f"{t}.{src}.weight"]))
            _put(p, layer + (dst, "bias"), sd[f"{t}.{src}.bias"])
        _put(p, layer + ("attn_norm", "scale"), sd[f"{t}.self_attn_layer_norm.weight"])
        _put(p, layer + ("attn_norm", "bias"), sd[f"{t}.self_attn_layer_norm.bias"])
        _put(p, layer + ("final_norm", "scale"), sd[f"{t}.final_layer_norm.weight"])
        _put(p, layer + ("final_norm", "bias"), sd[f"{t}.final_layer_norm.bias"])
    return {"params": p}


def convert_transformers_state_dict(sd: dict, output_layer: int = 9,
                                    conv_layers=CONV_LAYERS) -> dict:
    """Hugging Face HubertModel state dict -> flax variables (test oracle)."""
    p: dict = {}
    for i in range(len(conv_layers)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        _put(p, ("feature_extractor", f"conv_{i}", "kernel"),
             np.transpose(w, (2, 1, 0)))
        if i == 0:
            _put(p, ("feature_extractor", "group_norm", "scale"),
                 sd["feature_extractor.conv_layers.0.layer_norm.weight"])
            _put(p, ("feature_extractor", "group_norm", "bias"),
                 sd["feature_extractor.conv_layers.0.layer_norm.bias"])
    _put(p, ("feature_norm", "scale"), sd["feature_projection.layer_norm.weight"])
    _put(p, ("feature_norm", "bias"), sd["feature_projection.layer_norm.bias"])
    _put(p, ("post_proj", "kernel"),
         np.transpose(sd["feature_projection.projection.weight"]))
    _put(p, ("post_proj", "bias"), sd["feature_projection.projection.bias"])

    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        wg = sd["encoder.pos_conv_embed.conv.weight_g"]
        wv = sd["encoder.pos_conv_embed.conv.weight_v"]
    else:  # torch >= 2.1 parametrized weight norm
        wg = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        wv = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
    w = _fold_weight_norm(np.asarray(wg, np.float32), np.asarray(wv, np.float32))
    _put(p, ("pos_conv_kernel",), np.transpose(w, (2, 1, 0)))
    _put(p, ("pos_conv_bias",), sd["encoder.pos_conv_embed.conv.bias"])
    _put(p, ("encoder_norm", "scale"), sd["encoder.layer_norm.weight"])
    _put(p, ("encoder_norm", "bias"), sd["encoder.layer_norm.bias"])

    for i in range(output_layer):
        t = f"encoder.layers.{i}"
        layer = (f"layer_{i}",)
        for src, dst in (("attention.q_proj", "q_proj"),
                         ("attention.k_proj", "k_proj"),
                         ("attention.v_proj", "v_proj"),
                         ("attention.out_proj", "out_proj"),
                         ("feed_forward.intermediate_dense", "fc1"),
                         ("feed_forward.output_dense", "fc2")):
            _put(p, layer + (dst, "kernel"), np.transpose(sd[f"{t}.{src}.weight"]))
            _put(p, layer + (dst, "bias"), sd[f"{t}.{src}.bias"])
        _put(p, layer + ("attn_norm", "scale"), sd[f"{t}.layer_norm.weight"])
        _put(p, layer + ("attn_norm", "bias"), sd[f"{t}.layer_norm.bias"])
        _put(p, layer + ("final_norm", "scale"), sd[f"{t}.final_layer_norm.weight"])
        _put(p, layer + ("final_norm", "bias"), sd[f"{t}.final_layer_norm.bias"])
    return {"params": p}


class _StubUnpickler(pickle.Unpickler):
    """Unpickler that stubs classes from packages absent in this image
    (fairseq config dataclasses, omegaconf containers)."""

    class _Stub:
        def __init__(self, *args, **kwargs):
            self.__dict__.update(kwargs)

        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (self._Stub,), {"__module__": module})


def load_fairseq_checkpoint(path: pathlib.Path | str) -> dict:
    """Extract the raw weight tensors from a fairseq .pt without fairseq."""
    import torch

    with open(path, "rb") as f:
        try:
            ckpt = torch.load(f, map_location="cpu", weights_only=False,
                              pickle_module=_PickleShim)
        except Exception:
            f.seek(0)
            ckpt = torch.load(f, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in state.items() if hasattr(v, "detach")}


class _PickleShim:
    """pickle-module shim handing torch our tolerant Unpickler."""
    Unpickler = _StubUnpickler
    load = staticmethod(pickle.load)
    dumps = staticmethod(pickle.dumps)
    loads = staticmethod(pickle.loads)
    HIGHEST_PROTOCOL = pickle.HIGHEST_PROTOCOL


def conv_frames(n_samples: int, upto: int | None = None,
                conv_layers=CONV_LAYERS) -> int:
    """Output frame count of the first ``upto`` VALID conv layers."""
    for dim, kernel, stride in conv_layers[:upto]:
        n_samples = (n_samples - kernel) // stride + 1
    return n_samples


def _sample_bucket(n: int, start: int = 16000) -> int:
    """Geometric (x1.5) sample-count bucket: bounded compile count across a
    dataset of arbitrary song lengths (each distinct jit shape costs minutes
    through the remote TPU compiler)."""
    b = start
    while b < n:
        b = b * 3 // 2
    return b


class ContentVecEncoder:
    """Drop-in for the reference ContentVec768L12 units encoder.

    Waveforms are zero-padded to geometric sample buckets so a whole dataset
    binarizes with a handful of compiled programs instead of one per song
    length; masked GroupNorm/pos-conv/attention make the padded forward
    bit-equal to the unpadded one on real frames (see HubertEncoder). The
    weights ride as a jit argument, never a closure constant (the remote TPU
    compiler rejects programs with baked-in ~100 MB constants — CLAUDE.md).
    """

    _cache: dict = {}

    def __init__(self, ckpt_path: pathlib.Path | str, output_layer: int = 9):
        self.model = HubertEncoder(output_layer=output_layer)
        sd = load_fairseq_checkpoint(ckpt_path)
        # device_put ONCE: as device-resident Arrays the weights stay put and
        # the jit argument is a no-copy reference; host-numpy args would
        # re-upload ~100 MB per call
        self.variables = jax.device_put(
            convert_fairseq_state_dict(sd, output_layer=output_layer))
        self._forward = jax.jit(
            lambda variables, w, n0, nf: self.model.apply(variables, w, n0, nf))

    @classmethod
    def cached(cls, ckpt_path) -> "ContentVecEncoder":
        key = str(ckpt_path)
        if key not in cls._cache:
            if ckpt_path is None or not pathlib.Path(ckpt_path).exists():
                raise FileNotFoundError(
                    f"contentvec checkpoint not found: {ckpt_path}")
            cls._cache[key] = cls(ckpt_path)
        return cls._cache[key]

    def __call__(self, waveform: np.ndarray, sample_rate: int = 44100) -> np.ndarray:
        """[S] waveform -> [T, 768] units at the encoder's 50 Hz grid."""
        from some_tpu.audio.wavio import resample

        if sample_rate != 16000:
            waveform = resample(waveform, sample_rate, 16000)
        waveform = np.asarray(waveform, np.float32)
        n = len(waveform)
        n_real = max(conv_frames(n), 0)
        if n_real == 0:  # shorter than the conv stack's receptive field
            return np.zeros((0, EMBED_DIM), np.float32)
        padded = np.zeros(_sample_bucket(n), np.float32)
        padded[:n] = waveform
        n_real0 = max(conv_frames(n, upto=1), 0)
        out = self._forward(self.variables, padded[None],
                            jnp.int32(n_real0), jnp.int32(n_real))
        return np.asarray(out)[0, :n_real]
