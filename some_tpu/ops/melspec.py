"""On-device log-mel frontend (jitted, static shapes).

Numerically matches the host implementation (some_tpu/audio/mel.py) and the
reference torch.stft pipeline (reference: modules/rmvpe/spec.py:38-72) for
keyshift=0: center pad (win//2 left, (win+1)//2 right) -> periodic-hann
frames -> rFFT magnitude -> HTK/slaney mel matmul -> log(clamp).

Two spectrum methods:
  * 'rfft' — jnp.fft.rfft (XLA's TPU FFT). Default: matches the reference's
    f32 torch FFT to ~1e-4 in the log-mel domain. The spectrum is sliced to
    the mel filterbank's support before |.| and the mel matmul (exact — the
    removed bins carry zero weight).
  * 'dft'  — windowed DFT as two real matmuls on the MXU, truncated to the
    filterbank support. The window is folded into the DFT matrices so
    framing -> matmul -> |.| -> mel matmul is a pure matmul chain. Measured
    +10.6% whole-pipeline compute RTF over rfft on-chip (BENCH_NOTES "mel
    method"), but direct summation costs ~1e-2 log-mel accuracy to
    cancellation at quiet bins: note-exact at production geometry in f32,
    flips 3/179 knife-edge notes in bf16 (F1 0.983) on the random-weights
    prod-parity harness — hence opt-in, per the F1-unchanged default rule.
    (A two-stage Cooley-Tukey matmul factorization was prototyped and
    REJECTED: decimation concentrates the cancellation into the final
    stage with larger operands — measured max log-mel error 5e-3, worse
    than the direct 2e-3.)

Key-shift augmentation needs data-dependent n_fft and therefore lives on
host (binarization-time only); see some_tpu/audio/mel.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from some_tpu.audio.mel import hann_window, mel_filterbank


class LogMelSpec:
    """Precomputed constants + jitted __call__ for batched waveforms."""

    def __init__(self, n_mels: int, sample_rate: int, win_length: int, hop_length: int,
                 n_fft: int | None = None, fmin: float = 0, fmax: float | None = None,
                 clamp: float = 1e-5, method: str = "rfft", dtype=jnp.float32,
                 mag_scale: float = 1.0):
        self.n_fft = win_length if n_fft is None else n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.clamp = clamp
        self.method = method
        self.dtype = dtype

        # mag_scale compensates the STFT magnitude for a shorter analysis
        # window when the wire audio is decimated (wire_sr): a periodic hann
        # of length N/f sums to exactly 1/f of the length-N window, so the
        # magnitude of in-band content scales by 1/f. Folding the factor
        # into the window (which the dft path folds into its matrices) makes
        # the compensation exact at zero runtime cost.
        window = hann_window(self.win_length, dtype=np.float64) * float(mag_scale)
        if self.win_length < self.n_fft:
            pad_l = (self.n_fft - self.win_length) // 2
            w = np.zeros(self.n_fft, dtype=np.float64)
            w[pad_l:pad_l + self.win_length] = window
            window = w
        self.window = jnp.asarray(window, dtype=jnp.float32)
        self.basis = jnp.asarray(
            mel_filterbank(sample_rate, self.n_fft, n_mels, fmin, fmax))

        n_bins = self.n_fft // 2 + 1
        basis_np = np.asarray(self.basis)
        # exact truncation: only spectrum bins with nonzero mel weight
        # contribute to the output (fmin..fmax covers ~1/3 of the bins at
        # the production config). The dft matmuls shrink ~3x; the rfft path
        # slices the spectrum before |.| and the mel matmul — removed terms
        # carry exactly-zero weight, so the output is unchanged up to f32
        # accumulation-order noise (<1e-6, far under the oracle tolerances).
        used = np.nonzero(basis_np.any(axis=0))[0]
        k_lo, k_hi = (int(used[0]), int(used[-1]) + 1) if len(used) \
            else (0, n_bins)
        self._k_lo, self._k_hi = k_lo, k_hi
        self.basis_trim = jnp.asarray(basis_np[:, k_lo:k_hi])

        if method == "dft":
            self.basis_dft = self.basis_trim
            n = np.arange(self.n_fft)[:, None]
            k = np.arange(k_lo, k_hi)[None, :]
            angle = 2.0 * np.pi * n * k / self.n_fft
            # window folded in: frames @ Wc == rfft(frames * window).real
            self.dft_cos = jnp.asarray((np.cos(angle) * window[:, None]).astype(np.float32))
            self.dft_sin = jnp.asarray((-np.sin(angle) * window[:, None]).astype(np.float32))

    def num_frames(self, n_samples: int) -> int:
        return n_samples // self.hop_length + 1

    def _frames(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] padded audio -> [B, F, n_fft] (bit-exact window extraction)."""
        num_frames = (audio.shape[-1] - self.n_fft) // self.hop_length + 1
        if self.n_fft % self.hop_length == 0:
            # Exact reshape/slice scheme: frame f is the concatenation of
            # n_fft//hop consecutive hop-sized chunks starting at chunk f.
            # Pure data movement — no conv/gather rounding, XLA fuses it.
            ratio = self.n_fft // self.hop_length
            total = (num_frames + ratio - 1) * self.hop_length
            if audio.shape[-1] < total:
                audio = jnp.pad(audio, ((0, 0), (0, total - audio.shape[-1])))
            chunks = audio[:, :total].reshape(audio.shape[0], -1, self.hop_length)
            frames = jnp.concatenate(
                [chunks[:, i:i + num_frames] for i in range(ratio)], axis=-1)
            return frames
        starts = jnp.arange(num_frames) * self.hop_length
        idx = starts[:, None] + jnp.arange(self.n_fft)[None, :]
        return audio[:, idx]

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] (or [T]) float32 -> log-mel [B, F, n_mels] with F = T//hop + 1."""
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]
        audio = audio.astype(jnp.float32)
        audio = jnp.pad(audio, ((0, 0), (self.win_length // 2, (self.win_length + 1) // 2)))
        frames = self._frames(audio)  # [B, F, n_fft]
        if self.method == "dft":
            # HIGHEST: full-f32 matmul passes on the MXU; the direct DFT loses
            # ~1e-2 log-mel accuracy to cancellation otherwise (vs f32 FFT).
            re = jnp.einsum("bfn,nk->bfk", frames, self.dft_cos,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            im = jnp.einsum("bfn,nk->bfk", frames, self.dft_sin,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            magnitude = jnp.sqrt(re * re + im * im)
            basis = self.basis_dft
        else:
            spec = jnp.fft.rfft(frames * self.window, axis=-1)
            magnitude = jnp.abs(spec[..., self._k_lo:self._k_hi])
            basis = self.basis_trim
        mel = jnp.einsum("bfk,mk->bfm", magnitude, basis,
                         preferred_element_type=jnp.float32)
        out = jnp.log(jnp.maximum(mel, self.clamp)).astype(self.dtype)
        return out[0] if squeeze else out
