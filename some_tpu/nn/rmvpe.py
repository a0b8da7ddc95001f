"""RMVPE vocal pitch estimator, ported to JAX/flax.

Architecture parity with the reference port of RMVPE
(reference: modules/rmvpe/model.py, deepunet.py, seq.py, constants.py):
E2E0 = 5-level residual-conv U-Net over [B, T, 128-mel, 1] (avg-pool down,
transposed-conv up) -> 3-channel conv -> 1-layer BiGRU (256 hidden each way,
via lax.scan) -> Linear -> sigmoid over 360 20-cent pitch classes.

The published ``model.pt`` checkpoint loads through
``convert_rmvpe_state_dict`` (torch layout -> flax tree; the TimbreFilter
parameters exist in the checkpoint but are dead weight upstream too —
DeepUnet0.forward never calls them — so they are dropped).

Inference wrapper parity (reference: modules/rmvpe/inference.py:13-66):
resample to 16 kHz, log-mel (128 mels, win 1024, hop 160, fmin 30, fmax 8000),
pad T to a multiple of 32, forward, local-average (or Viterbi) decode to f0,
unvoiced interpolation, resample the curve to the caller's hop grid.
"""
from __future__ import annotations

import pathlib
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_CLASS = 360
N_MELS = 128
MEL_FMIN = 30
MEL_FMAX = 8000
WINDOW_LENGTH = 1024
HOP_LENGTH = 160
CENTS_CONST = 1997.3794084376191


# ---------------------------------------------------------------- modules
def _mask_time(x, t_valid):
    """Zero all frames at time index >= t_valid (axis 1).

    Emulates "the array ends at t_valid with conv zero-padding" inside a
    longer (bucket-padded) array: BatchNorm maps zero input to a nonzero
    constant (running stats + beta), so without re-zeroing, values beyond
    t_valid would leak back into real frames through the next 3x3 conv and
    break parity with the reference's exact pad-to-32 program."""
    if t_valid is None:
        return x
    tv = jnp.asarray(t_valid)
    t = jnp.arange(x.shape[1])
    if tv.ndim:                       # per-row lengths [B]
        mask = t[None, :] < tv[:, None]
    else:                             # one scalar length for the whole batch
        mask = (t < tv)[None, :]
    mask = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
    return jnp.where(mask, x, 0)


class ConvBlockRes(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False, t_valid=None):
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, name="bn1")(h)
        h = _mask_time(nn.relu(h), t_valid)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, name="bn2")(h)
        h = nn.relu(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return _mask_time(h + x, t_valid)


class ResEncoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 4
    pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, t_valid=None):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"block_{i}")(
                x, train, t_valid)
        if self.pool:
            # t_valid is a multiple of 32 >= 2**en_de_layers, so pool windows
            # never straddle the valid/pad boundary at any level
            pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
            return x, pooled
        return x


class ResDecoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x, skip, train: bool = False, t_valid=None):
        # torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1)
        # == lhs-dilated conv with flipped kernel, pad (1, 2) per spatial dim
        kernel = self.param(
            "up_kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.out_channels), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1),
            padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, name="up_bn")(y)
        # t_valid here is the OUTPUT level's valid length (2x the input's)
        y = _mask_time(nn.relu(y), t_valid)
        y = jnp.concatenate([y, skip], axis=-1)
        for i in range(self.n_blocks):
            y = ConvBlockRes(self.out_channels, name=f"block_{i}")(
                y, train, t_valid)
        return y


class DeepUnet(nn.Module):
    en_de_layers: int = 5
    inter_layers: int = 4
    n_blocks: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False, t_valid=None):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, name="in_bn")(x)
        x = _mask_time(x, t_valid)

        def tv(level):  # valid frames at downsampling level (t_valid >> level)
            return None if t_valid is None else t_valid // (1 << level)

        skips = []
        channels = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(channels, self.n_blocks,
                                      name=f"enc_{i}")(x, train, tv(i))
            skips.append(skip)
            channels *= 2
        # intermediate: first block doubles channels, rest keep
        deep = self.en_de_layers
        x = ResEncoderBlock(channels, self.n_blocks, pool=False,
                            name="inter_0")(x, train, tv(deep))
        for i in range(1, self.inter_layers):
            x = ResEncoderBlock(channels, self.n_blocks, pool=False,
                                name=f"inter_{i}")(x, train, tv(deep))
        for i in range(self.en_de_layers):
            channels //= 2
            x = ResDecoderBlock(channels, self.n_blocks,
                                name=f"dec_{i}")(x, skips[-1 - i], train,
                                                 tv(deep - 1 - i))
        return x


def _gru_scan(x, w_ih, w_hh, b_ih, b_hh, reverse: bool = False, length=None):
    """Single-direction GRU over [B, T, C] -> [B, T, H] (torch gate order r,z,n).

    With ``length``, steps at time index >= length pass the hidden state
    through unchanged, so bucket padding beyond ``length`` never enters the
    recurrence — for the reverse direction this is what makes the scan
    independent of how far the static bucket extends past the semantic
    (pad-to-32) length."""
    H = w_hh.shape[1]
    x_proj = jnp.einsum("btc,gc->btg", x, w_ih) + b_ih  # [B, T, 3H]

    def cell(h, step):
        xt, t = step
        xr, xz, xn = xt[:, :H], xt[:, H:2 * H], xt[:, 2 * H:]
        hr = h @ w_hh[:H].T + b_hh[:H]
        hz = h @ w_hh[H:2 * H].T + b_hh[H:2 * H]
        hn = h @ w_hh[2 * H:].T + b_hh[2 * H:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1 - z) * n + z * h
        if length is not None:
            keep = t < jnp.asarray(length)     # scalar, or [B] per-row
            if getattr(keep, "ndim", 0):
                keep = keep[:, None]
            h_new = jnp.where(keep, h_new, h)
        return h_new, h_new

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 3H]
    ts = jnp.arange(x.shape[1])
    if reverse:
        xs = xs[::-1]
        ts = ts[::-1]
    h0 = jnp.zeros((x.shape[0], H), x.dtype)
    _, ys = jax.lax.scan(cell, h0, (xs, ts))
    if reverse:
        ys = ys[::-1]
    return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


class BiGRU(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, x, length=None):
        C = x.shape[-1]
        shape_ih = (3 * self.hidden, C)
        shape_hh = (3 * self.hidden, self.hidden)
        init = nn.initializers.lecun_normal()
        fw = _gru_scan(
            x,
            self.param("w_ih_fw", init, shape_ih, jnp.float32),
            self.param("w_hh_fw", init, shape_hh, jnp.float32),
            self.param("b_ih_fw", nn.initializers.zeros, (3 * self.hidden,), jnp.float32),
            self.param("b_hh_fw", nn.initializers.zeros, (3 * self.hidden,), jnp.float32),
            length=length)
        bw = _gru_scan(
            x,
            self.param("w_ih_bw", init, shape_ih, jnp.float32),
            self.param("w_hh_bw", init, shape_hh, jnp.float32),
            self.param("b_ih_bw", nn.initializers.zeros, (3 * self.hidden,), jnp.float32),
            self.param("b_hh_bw", nn.initializers.zeros, (3 * self.hidden,), jnp.float32),
            reverse=True, length=length)
        return jnp.concatenate([fw, bw], axis=-1)


class E2E0(nn.Module):
    """mel [B, T, 128] -> pitch-class probabilities [B, T, 360]."""
    n_blocks: int = 4
    n_gru: int = 1
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, mel, train: bool = False, t_valid=None):
        # t_valid masking is inference-only: with train=True the _mask_time
        # zeros would enter BatchNorm BATCH statistics, silently breaking
        # the exact-pad equivalence the mask exists to provide (ADVICE r4)
        if train and t_valid is not None:
            raise ValueError("t_valid masking is inference-only: masked "
                             "zeros would pollute BatchNorm batch stats")
        x = mel[..., None]  # [B, T, M, 1]
        x = DeepUnet(self.en_de_layers, self.inter_layers, self.n_blocks,
                     self.en_out_channels, name="unet")(x, train, t_valid)
        x = nn.Conv(3, (3, 3), padding=1, name="head_conv")(x)  # [B, T, M, 3]
        B, T, M = x.shape[0], x.shape[1], x.shape[2]
        # torch: transpose(1,2).flatten(-2) on [B,3,T,M] -> [B,T,3*M]
        x = jnp.swapaxes(x, 2, 3).reshape(B, T, 3 * M)
        if self.n_gru:
            # no mask needed after head_conv: the GRU skips t >= t_valid and
            # everything past the semantic length is trimmed by the caller
            x = BiGRU(256, name="gru")(x, length=t_valid)
        x = nn.Dense(N_CLASS, name="fc")(x)
        return jax.nn.sigmoid(x)


# ---------------------------------------------------------------- decode
def _argmax_window(hidden):
    """Device-side shrink of the decode fetch: [B, T, 360] probabilities ->
    (center [B, T] int32, window [B, T, 9] f32), the only values
    local_average_cents reads. Fetching these instead of the full hidden is
    a 36x smaller download (the dominant per-call cost on a tunneled chip:
    35.4 MB / 1.09 s vs 0.17 s of compute, .bench_logs/rmvpe_profile_r5) and
    BIT-exact: scattering the window back into a zeros [B, T, 360] array
    reproduces the original array at every position the decode's mask can
    select (edge-clipped duplicate indices rewrite the same value), and
    adding exact 0.0 terms never changes a float sum."""
    center = jnp.argmax(hidden, axis=2).astype(jnp.int32)
    idx = jnp.clip(center[..., None] + jnp.arange(-4, 5), 0, N_CLASS - 1)
    window = jnp.take_along_axis(hidden, idx, axis=2)
    return center, window


def _decode_window(center: np.ndarray, window: np.ndarray,
                   thred: float = 0.03) -> np.ndarray:
    """Host half of the window fetch: rebuild the sparse probability array
    and run the unmodified decode on it (same sums, same argmax, same uv
    threshold — see _argmax_window)."""
    center = np.asarray(center)
    window = np.asarray(window)
    sparse = np.zeros(center.shape + (N_CLASS,), np.float32)
    idx = np.clip(center[..., None] + np.arange(-4, 5), 0, N_CLASS - 1)
    np.put_along_axis(sparse, idx, window, axis=2)
    return local_average_cents(sparse, center=center[..., None], thred=thred)


def local_average_cents(hidden: np.ndarray, center: Optional[np.ndarray] = None,
                        thred: float = 0.03) -> np.ndarray:
    """Prob-weighted average over argmax+-4 bins -> f0 Hz, unvoiced -> 0
    (reference: modules/rmvpe/utils.py:8-24)."""
    hidden = np.asarray(hidden)
    idx = np.arange(N_CLASS)[None, None, :]
    idx_cents = idx * 20 + CENTS_CONST
    if center is None:
        center = np.argmax(hidden, axis=2, keepdims=True)
    start = np.clip(center - 4, 0, None)
    end = np.clip(center + 5, None, N_CLASS)
    mask = (idx >= start) & (idx < end)
    weights = hidden * mask
    product_sum = np.sum(weights * idx_cents, axis=2)
    weight_sum = np.sum(weights, axis=2)
    cents = product_sum / (weight_sum + (weight_sum == 0))
    f0 = 10 * 2 ** (cents / 1200)
    uv = hidden.max(axis=2) < thred
    return (f0 * ~uv).squeeze(0)


def viterbi_cents(hidden: np.ndarray, thred: float = 0.03) -> np.ndarray:
    """Viterbi-smoothed decode (reference: modules/rmvpe/utils.py:27-43),
    with a self-contained numpy Viterbi replacing librosa.sequence.viterbi."""
    xx, yy = np.meshgrid(range(N_CLASS), range(N_CLASS))
    transition = np.maximum(30 - abs(xx - yy), 0).astype(np.float64)
    transition = transition / transition.sum(axis=1, keepdims=True)

    prob = np.asarray(hidden, dtype=np.float64).squeeze(0).T  # [N, T]
    prob = prob / prob.sum(axis=0, keepdims=True)

    log_trans = np.log(transition + 1e-300)
    log_prob = np.log(prob + 1e-300)
    T = log_prob.shape[1]
    value = log_prob[:, 0] + np.log(1.0 / N_CLASS)
    back = np.zeros((T, N_CLASS), dtype=np.int64)
    for t in range(1, T):
        scores = value[:, None] + log_trans  # [from, to]
        back[t] = scores.argmax(axis=0)
        value = scores.max(axis=0) + log_prob[:, t]
    path = np.zeros(T, dtype=np.int64)
    path[-1] = value.argmax()
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    center = path[None, :, None]
    return local_average_cents(hidden, center=center, thred=thred)


# ---------------------------------------------------------------- converter
def convert_rmvpe_state_dict(state: dict, en_de_layers: int = 5,
                             inter_layers: int = 4, n_blocks: int = 4) -> dict:
    """torch RMVPE 'model' state dict -> flax variables tree."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = np.asarray(value)

    def conv_w(v):   # [out,in,kh,kw] -> [kh,kw,in,out]
        return np.transpose(v, (2, 3, 1, 0))

    def convblock(prefix_t: str, path: tuple, sd: dict):
        """torch ConvBlockRes ('conv.0/1/3/4' + optional shortcut) -> flax."""
        put(params, path + ("conv1", "kernel"), conv_w(sd[f"{prefix_t}.conv.0.weight"]))
        put(params, path + ("bn1", "scale"), sd[f"{prefix_t}.conv.1.weight"])
        put(params, path + ("bn1", "bias"), sd[f"{prefix_t}.conv.1.bias"])
        put(batch_stats, path + ("bn1", "mean"), sd[f"{prefix_t}.conv.1.running_mean"])
        put(batch_stats, path + ("bn1", "var"), sd[f"{prefix_t}.conv.1.running_var"])
        put(params, path + ("conv2", "kernel"), conv_w(sd[f"{prefix_t}.conv.3.weight"]))
        put(params, path + ("bn2", "scale"), sd[f"{prefix_t}.conv.4.weight"])
        put(params, path + ("bn2", "bias"), sd[f"{prefix_t}.conv.4.bias"])
        put(batch_stats, path + ("bn2", "mean"), sd[f"{prefix_t}.conv.4.running_mean"])
        put(batch_stats, path + ("bn2", "var"), sd[f"{prefix_t}.conv.4.running_var"])
        if f"{prefix_t}.shortcut.weight" in sd:
            put(params, path + ("shortcut", "kernel"),
                conv_w(sd[f"{prefix_t}.shortcut.weight"]))
            put(params, path + ("shortcut", "bias"), sd[f"{prefix_t}.shortcut.bias"])

    sd = state
    # encoder input BN
    put(params, ("unet", "in_bn", "scale"), sd["unet.encoder.bn.weight"])
    put(params, ("unet", "in_bn", "bias"), sd["unet.encoder.bn.bias"])
    put(batch_stats, ("unet", "in_bn", "mean"), sd["unet.encoder.bn.running_mean"])
    put(batch_stats, ("unet", "in_bn", "var"), sd["unet.encoder.bn.running_var"])

    for layer in range(en_de_layers):
        for block in range(n_blocks):
            convblock(f"unet.encoder.layers.{layer}.conv.{block}",
                      ("unet", f"enc_{layer}", f"block_{block}"), sd)
    for inter in range(inter_layers):
        for block in range(n_blocks):
            convblock(f"unet.intermediate.layers.{inter}.conv.{block}",
                      ("unet", f"inter_{inter}", f"block_{block}"), sd)
    for layer in range(en_de_layers):
        t = f"unet.decoder.layers.{layer}"
        # ConvTranspose2d weight [in, out, kh, kw] -> flipped [kh,kw,in,out]
        w = sd[f"{t}.conv1.0.weight"]
        put(params, ("unet", f"dec_{layer}", "up_kernel"),
            np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy())
        # note: torch ConvTranspose2d here is bias-free (bias=False)
        put(params, ("unet", f"dec_{layer}", "up_bn", "scale"),
            sd[f"{t}.conv1.1.weight"])
        put(params, ("unet", f"dec_{layer}", "up_bn", "bias"),
            sd[f"{t}.conv1.1.bias"])
        put(batch_stats, ("unet", f"dec_{layer}", "up_bn", "mean"),
            sd[f"{t}.conv1.1.running_mean"])
        put(batch_stats, ("unet", f"dec_{layer}", "up_bn", "var"),
            sd[f"{t}.conv1.1.running_var"])
        for block in range(n_blocks):
            convblock(f"{t}.conv2.{block}",
                      ("unet", f"dec_{layer}", f"block_{block}"), sd)

    put(params, ("head_conv", "kernel"), conv_w(sd["cnn.weight"]))
    put(params, ("head_conv", "bias"), sd["cnn.bias"])

    put(params, ("gru", "w_ih_fw"), sd["fc.0.gru.weight_ih_l0"])
    put(params, ("gru", "w_hh_fw"), sd["fc.0.gru.weight_hh_l0"])
    put(params, ("gru", "b_ih_fw"), sd["fc.0.gru.bias_ih_l0"])
    put(params, ("gru", "b_hh_fw"), sd["fc.0.gru.bias_hh_l0"])
    put(params, ("gru", "w_ih_bw"), sd["fc.0.gru.weight_ih_l0_reverse"])
    put(params, ("gru", "w_hh_bw"), sd["fc.0.gru.weight_hh_l0_reverse"])
    put(params, ("gru", "b_ih_bw"), sd["fc.0.gru.bias_ih_l0_reverse"])
    put(params, ("gru", "b_hh_bw"), sd["fc.0.gru.bias_hh_l0_reverse"])
    put(params, ("fc", "kernel"), np.asarray(sd["fc.1.weight"]).T)
    put(params, ("fc", "bias"), sd["fc.1.bias"])
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------- wrapper
def _bucket_frames(sem: int) -> int:
    """Snap a semantic (pad-to-32) frame count to a geometric bucket.

    Every distinct input shape is a fresh XLA program — through the remote
    TPU compiler that is minutes per song length, which dominates binarize
    wall time on any real dataset. Ratio-4/3 buckets snapped to multiples of
    32 bound the program count to ~16 across 5 s .. 3.5 min songs; the
    masked forward (t_valid) makes the result bit-independent of how far
    the bucket extends past the semantic length."""
    b = 512
    while b < sem:
        b = -(-b * 4 // 3)           # ceil(b * 4/3)
        b = ((b + 31) // 32) * 32
    return b


class RMVPE:
    _cache: dict = {}

    def __init__(self, model_path: pathlib.Path | str | None,
                 hop_length: int = HOP_LENGTH, bucket: bool = True):
        from some_tpu.audio.mel import MelSpec

        self.model = E2E0()
        self.hop_length = hop_length
        self.mel = MelSpec(N_MELS, SAMPLE_RATE, WINDOW_LENGTH, hop_length,
                           fmin=MEL_FMIN, fmax=MEL_FMAX)
        if model_path is not None:
            import torch
            ckpt = torch.load(str(model_path), map_location="cpu",
                              weights_only=False)
            sd = ckpt.get("model", ckpt)
            sd = {k: v.detach().cpu().numpy().astype(np.float32)
                  for k, v in sd.items() if hasattr(v, "detach")}
            self.variables = convert_rmvpe_state_dict(sd)
        else:  # random init (tests)
            self.variables = self.model.init(
                jax.random.PRNGKey(0), np.zeros((1, 32, N_MELS), np.float32))
        # variables ride as a jit ARGUMENT, not a closure constant: the
        # remote TPU compiler rejects programs with large baked-in weights
        # (HTTP 413 — see CLAUDE.md). device_put once so the checkpoint is a
        # device-resident reference (host-numpy args would re-upload ~170 MB
        # per call).
        self.variables = jax.device_put(self.variables)
        self.bucket = bucket
        # t_valid rides as a traced scalar argument: one compiled program per
        # BUCKET, shared by every semantic length inside it
        self._forward = jax.jit(
            lambda variables, mel, t_valid:
                self.model.apply(variables, mel, t_valid=t_valid))
        # decode-fetch variant for the batched pitch path: returns only the
        # (center, 9-bin window) the decode reads — 36x less download than
        # the full hidden through a tunneled host link (see _argmax_window)
        self._forward_window = jax.jit(
            lambda variables, mel, t_valid:
                _argmax_window(self.model.apply(variables, mel,
                                                t_valid=t_valid)))

    @classmethod
    def cached(cls, model_path) -> "RMVPE":
        if model_path is None:
            raise FileNotFoundError("no RMVPE checkpoint configured (pe_ckpt)")
        key = str(model_path)
        if key not in cls._cache:
            if not pathlib.Path(model_path).exists():
                raise FileNotFoundError(model_path)
            cls._cache[key] = cls(model_path)
        return cls._cache[key]

    def mel2hidden(self, mel: np.ndarray) -> np.ndarray:
        """mel [T, 128] -> probabilities [1, T, 360].

        Semantics match the reference's pad-T-to-a-multiple-of-32 forward
        (reference: modules/rmvpe/inference.py mel2hidden) exactly: the
        program is padded to a geometric bucket for shape reuse, and the
        t_valid mask makes everything past the semantic pad-32 length
        invisible to convs (via re-zeroing) and to the BiGRU (via skipped
        scan steps)."""
        n_frames = mel.shape[0]
        sem = 32 * ((n_frames - 1) // 32 + 1)
        total = _bucket_frames(sem) if self.bucket else sem
        mel = np.pad(mel, ((0, total - n_frames), (0, 0)))
        hidden = np.asarray(
            self._forward(self.variables, mel[None], np.int32(sem)))
        return hidden[:, :n_frames]

    def mel2hidden_batch(self, mels) -> list:
        """Many items' mels -> list of [1, T_i, 360], PACKED into full
        batches: items are sorted by length and taken 8 at a time, each
        chunk padded to the bucket of its LONGEST member (rows snapped to
        1/2/4/8). Numerics per item are identical to mel2hidden — t_valid
        is per-row, and the masked forward is bit-independent of how far
        the bucket extends past each row's semantic pad-32 length — so a
        short song riding in a long song's bucket decodes the same f0.

        Packing by chunk-max (instead of grouping items by their OWN
        bucket, the round-4 shape) is what makes this the binarize
        throughput path on a varied-length dataset: 8 songs of 4..30 s
        used to fan out into 6 near-empty per-bucket programs — six
        compiles and six serial tunnel round-trips — and now ride ONE
        [8, bucket(30 s)] forward. The extra conv FLOPs on pad rows are
        ~2x in the worst case; the avoided per-call costs (remote
        compile, RPC latency, 2x fewer sequential BiGRU scan steps than
        the per-bucket sum) dominate on real hardware. Length-sorting
        keeps pad waste low on large datasets: neighbours in a chunk have
        similar lengths, so only the tail chunk pads far."""
        results: list = [None] * len(mels)
        for chunk, batch, t_valid in self._packed_chunks(mels):
            hidden = np.asarray(self._forward(self.variables, batch, t_valid))
            for r, i in enumerate(chunk):
                results[i] = hidden[r:r + 1, :mels[i].shape[0]]
        return results

    def _packed_chunks(self, mels):
        """Yield (item_indices, mel_batch, t_valid) packed as described in
        mel2hidden_batch: length-sorted, 8 rows max, chunk-max bucket."""
        order = sorted(range(len(mels)), key=lambda i: -mels[i].shape[0])
        for pos in range(0, len(order), 8):
            chunk = order[pos:pos + 8]
            sems = [32 * ((mels[i].shape[0] - 1) // 32 + 1) for i in chunk]
            total = (_bucket_frames(max(sems)) if self.bucket
                     else max(sems))
            rows = 1 << max(0, (len(chunk) - 1).bit_length())  # 1/2/4/8
            batch = np.zeros((rows, total, N_MELS), np.float32)
            t_valid = np.full((rows,), 32, np.int32)  # dummy rows: minimal
            for r, (i, sem) in enumerate(zip(chunk, sems)):
                batch[r, :mels[i].shape[0]] = mels[i]
                t_valid[r] = sem
            yield chunk, batch, t_valid

    def audio_to_mel(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """Resample to RMVPE's native 16 kHz and compute its log-mel."""
        from some_tpu.audio.wavio import resample

        if sample_rate != SAMPLE_RATE:
            audio = resample(audio, sample_rate, SAMPLE_RATE)
        return self.mel(audio)  # [T, 128]

    def f0_batch(self, waveforms, sample_rate: int,
                 thred: float = 0.03) -> list:
        """Many waveforms -> list of 10 ms f0 curves, with the device
        forwards packed into full batches (_packed_chunks) and only the
        decode window fetched (_argmax_window: 36x less download than the
        full hidden, bit-identical f0). Finish per item with f0_to_grid.
        This is the dataset-binarize shape: the sequential BiGRU costs one
        scan per packed chunk instead of one per song."""
        mels = [self.audio_to_mel(w, sample_rate) for w in waveforms]
        results: list = [None] * len(mels)
        for chunk, batch, t_valid in self._packed_chunks(mels):
            center, window = self._forward_window(
                self.variables, batch, t_valid)
            center, window = np.asarray(center), np.asarray(window)
            for r, i in enumerate(chunk):
                n = mels[i].shape[0]
                results[i] = _decode_window(center[r:r + 1, :n],
                                            window[r:r + 1, :n], thred=thred)
        return results

    def infer_from_audio(self, audio: np.ndarray, sample_rate: int = 16000,
                         thred: float = 0.03, use_viterbi: bool = False) -> np.ndarray:
        mel = self.audio_to_mel(audio, sample_rate)
        hidden = self.mel2hidden(mel)
        if use_viterbi:
            return viterbi_cents(hidden, thred=thred)
        return local_average_cents(hidden, thred=thred)

    @staticmethod
    def f0_to_grid(f0: np.ndarray, sample_rate: int, hop_size: int,
                   length: int, interp_uv: bool = False):
        """RMVPE's native 10 ms f0 curve -> the caller's hop grid
        (the tail of reference rmvpe/inference.py:56-66). Split out so a
        batched forward (mel2hidden_batch) can cache the 10 ms curve and
        finish per item."""
        from some_tpu.utils.pitch import interp_f0, resample_align_curve

        uv = f0 == 0
        f0, uv = interp_f0(f0, uv)
        time_step = hop_size / sample_rate
        f0_res = resample_align_curve(f0, 0.01, time_step, length)
        uv_res = resample_align_curve(uv.astype(np.float32), 0.01, time_step,
                                      length) > 0.5
        if not interp_uv:
            f0_res[uv_res] = 0
        return f0_res, uv_res

    def get_pitch(self, waveform: np.ndarray, sample_rate: int, hop_size: int,
                  length: int, interp_uv: bool = False):
        """f0 on the caller's hop grid (reference: rmvpe/inference.py:56-66)."""
        f0 = self.infer_from_audio(waveform, sample_rate=sample_rate)
        return self.f0_to_grid(f0, sample_rate, hop_size, length,
                               interp_uv=interp_uv)
