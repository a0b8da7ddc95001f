"""Mel frontend parity: numpy & JAX implementations vs a torch.stft oracle.

The oracle reproduces the reference mel pipeline
(reference: modules/rmvpe/spec.py:38-72) directly with torch ops, so parity
here implies parity with the PyTorch reference.
"""
import numpy as np
import pytest
import torch

from some_tpu.audio.mel import MelSpec, hann_window, mel_filterbank
from some_tpu.ops.melspec import LogMelSpec

SR, N_MELS, WIN, HOP, FMIN, FMAX = 44100, 80, 2048, 512, 40, 8000


def torch_logmel_oracle(audio_np, keyshift=0.0, sr=SR, n_mels=N_MELS, win=WIN,
                        hop=HOP, fmin=FMIN, fmax=FMAX, clamp=1e-5):
    """Independent torch implementation of the reference mel pipeline."""
    basis = torch.from_numpy(mel_filterbank(sr, win, n_mels, fmin, fmax))
    factor = 2 ** (keyshift / 12)
    n_fft_new = int(np.round(win * factor))
    win_new = int(np.round(win * factor))
    audio = torch.from_numpy(audio_np).float().unsqueeze(0)
    audio = torch.nn.functional.pad(audio, (win_new // 2, (win_new + 1) // 2))
    fft = torch.stft(
        audio, n_fft=n_fft_new, hop_length=hop, win_length=win_new,
        window=torch.hann_window(win_new), center=False, return_complex=True,
    )
    magnitude = fft.abs()
    if keyshift != 0:
        size = win // 2 + 1
        if magnitude.size(1) < size:
            magnitude = torch.nn.functional.pad(magnitude, (0, 0, 0, size - magnitude.size(1)))
        magnitude = magnitude[:, :size, :] * win / win_new
    mel = torch.matmul(basis, magnitude)
    return torch.log(torch.clamp(mel, min=clamp)).squeeze(0).T.numpy()  # [F, n_mels]


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(7)
    t = np.arange(SR)  # 1 second
    sig = (0.4 * np.sin(2 * np.pi * 440 * t / SR)
           + 0.2 * np.sin(2 * np.pi * 880 * t / SR)
           + 0.01 * rng.standard_normal(SR))
    return sig.astype(np.float32)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(2048, dtype=np.float32), torch.hann_window(2048).numpy(),
        atol=1e-7)


def test_filterbank_properties():
    fb = mel_filterbank(SR, WIN, N_MELS, FMIN, FMAX)
    assert fb.shape == (N_MELS, WIN // 2 + 1)
    assert (fb >= 0).all()
    assert fb.sum() > 0
    # every mel band has some support
    assert (fb.sum(axis=1) > 0).all()


def test_numpy_mel_matches_torch_oracle(audio):
    ours = MelSpec(N_MELS, SR, WIN, HOP, fmin=FMIN, fmax=FMAX)(audio)
    ref = torch_logmel_oracle(audio)
    assert ours.shape == ref.shape == (len(audio) // HOP + 1, N_MELS)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("keyshift", [-12.0, -4.37, 2.5, 12.0])
def test_numpy_mel_keyshift_matches_torch_oracle(audio, keyshift):
    ours = MelSpec(N_MELS, SR, WIN, HOP, fmin=FMIN, fmax=FMAX)(audio, keyshift=keyshift)
    ref = torch_logmel_oracle(audio, keyshift=keyshift)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_jax_mel_rfft_matches_numpy(audio):
    host = MelSpec(N_MELS, SR, WIN, HOP, fmin=FMIN, fmax=FMAX)(audio)
    dev = LogMelSpec(N_MELS, SR, WIN, HOP, fmin=FMIN, fmax=FMAX, method="rfft")
    out = np.asarray(dev(audio))
    assert out.shape == host.shape
    # f32 FFT vs f64 FFT: cancellation at quiet bins bounds worst-case error;
    # the torch reference's own f32 FFT sits at the same distance from f64
    diff = np.abs(out - host)
    assert diff.max() < 2e-2
    assert diff.mean() < 5e-4
    assert np.quantile(diff, 0.99) < 5e-3


def test_jax_mel_dft_close_to_rfft(audio):
    # direct f32 DFT summation loses precision to cancellation at quiet
    # bins; assert it stays within decoder-safe bounds of the FFT path
    rfft = np.asarray(LogMelSpec(N_MELS, SR, WIN, HOP, fmin=FMIN, fmax=FMAX,
                                 method="rfft")(audio))
    dft = np.asarray(LogMelSpec(N_MELS, SR, WIN, HOP, fmin=FMIN, fmax=FMAX,
                                method="dft")(audio))
    assert np.abs(dft - rfft).max() < 0.06


def test_halfrate_wire_mel_matches_native(audio):
    """wire_sr analysis equivalence: decimating the waveform 2x and halving
    sr/win/hop/n_fft (with mag_scale compensating the shorter window) must
    reproduce the native-rate log-mel. The division leaves bin frequencies
    (sr/n_fft), frame times (hop/sr), and the filterbank weights identical;
    the residual is the decimation filter's passband ripple plus >=115 dB
    aliasing (see wavio.wire_decimation_taps)."""
    from some_tpu.audio.wavio import decimate_wire

    native = np.asarray(
        LogMelSpec(N_MELS, SR, WIN, HOP, fmin=FMIN, fmax=FMAX)(audio))
    fb_native = mel_filterbank(SR, WIN, N_MELS, FMIN, FMAX)
    fb_half = mel_filterbank(SR // 2, WIN // 2, N_MELS, FMIN, FMAX)
    assert np.array_equal(fb_native[:, :fb_half.shape[1]], fb_half)

    half = np.asarray(LogMelSpec(
        N_MELS, SR // 2, WIN // 2, HOP // 2, fmin=FMIN, fmax=FMAX,
        mag_scale=2.0)(decimate_wire(audio, 2)))
    n = min(len(native), len(half))
    diff = np.abs(native[:n] - half[:n])
    # Edge frames window the zero-padded signal tail where the decimation
    # FIR is still rolling in — bound them loosely; interior frames carry
    # the equivalence claim (same tolerance class as the f32-vs-f64 FFT
    # bound above; measured mean ~3e-5 on voice-band audio).
    assert diff.max() < 0.2
    interior = diff[1:-1]
    assert interior.mean() < 2e-4, interior.mean()
    assert np.quantile(interior, 0.99) < 1e-2
    assert interior.max() < 5e-2


def test_jax_mel_batched(audio):
    dev = LogMelSpec(N_MELS, SR, WIN, HOP, fmin=FMIN, fmax=FMAX, method="rfft")
    batch = np.stack([audio, audio * 0.5])
    out = np.asarray(dev(batch))
    single = np.asarray(dev(audio))
    assert out.shape == (2, len(audio) // HOP + 1, N_MELS)
    np.testing.assert_allclose(out[0], single, atol=1e-5)
