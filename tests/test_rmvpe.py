"""RMVPE port parity vs a torch oracle of the reference architecture
(reference: modules/rmvpe/deepunet.py, model.py, seq.py)."""
import numpy as np
import pytest
import torch
import torch.nn as torch_nn

from some_tpu.nn.rmvpe import (
    E2E0, convert_rmvpe_state_dict, local_average_cents, viterbi_cents,
)

# small test geometry: 3 levels, 2 blocks, 32 mel bins
LAYERS, INTERS, BLOCKS, MELS, OUT_CH = 3, 2, 2, 32, 4


# ---- torch oracle (mirrors the reference module structure and key names) ----
class TConvBlockRes(torch_nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = torch_nn.Sequential(
            torch_nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            torch_nn.BatchNorm2d(cout, momentum=0.01),
            torch_nn.ReLU(),
            torch_nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            torch_nn.BatchNorm2d(cout, momentum=0.01),
            torch_nn.ReLU(),
        )
        if cin != cout:
            self.shortcut = torch_nn.Conv2d(cin, cout, 1)
            self.has_shortcut = True
        else:
            self.has_shortcut = False

    def forward(self, x):
        return self.conv(x) + (self.shortcut(x) if self.has_shortcut else x)


class TResEncoderBlock(torch_nn.Module):
    def __init__(self, cin, cout, pool, n_blocks):
        super().__init__()
        self.conv = torch_nn.ModuleList([TConvBlockRes(cin, cout)])
        for _ in range(n_blocks - 1):
            self.conv.append(TConvBlockRes(cout, cout))
        self.pool = torch_nn.AvgPool2d(2) if pool else None

    def forward(self, x):
        for blk in self.conv:
            x = blk(x)
        if self.pool is not None:
            return x, self.pool(x)
        return x


class TResDecoderBlock(torch_nn.Module):
    def __init__(self, cin, cout, n_blocks):
        super().__init__()
        self.conv1 = torch_nn.Sequential(
            torch_nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                                     output_padding=1, bias=False),
            torch_nn.BatchNorm2d(cout, momentum=0.01),
            torch_nn.ReLU(),
        )
        self.conv2 = torch_nn.ModuleList([TConvBlockRes(cout * 2, cout)])
        for _ in range(n_blocks - 1):
            self.conv2.append(TConvBlockRes(cout, cout))

    def forward(self, x, skip):
        x = self.conv1(x)
        x = torch.cat((x, skip), dim=1)
        for blk in self.conv2:
            x = blk(x)
        return x


class TOracleRMVPE(torch_nn.Module):
    """Key names match the reference state_dict layout (unet.encoder..., cnn, fc)."""

    def __init__(self):
        super().__init__()
        enc_layers = torch_nn.ModuleList()
        cin, cout, size = 1, OUT_CH, MELS
        for _ in range(LAYERS):
            enc_layers.append(TResEncoderBlock(cin, cout, True, BLOCKS))
            cin, cout, size = cout, cout * 2, size // 2
        inter = torch_nn.ModuleList([TResEncoderBlock(cin, cout, False, BLOCKS)])
        for _ in range(INTERS - 1):
            inter.append(TResEncoderBlock(cout, cout, False, BLOCKS))
        dec_layers = torch_nn.ModuleList()
        dcin = cout
        for _ in range(LAYERS):
            dec_layers.append(TResDecoderBlock(dcin, dcin // 2, BLOCKS))
            dcin //= 2

        self.unet = torch_nn.Module()
        self.unet.encoder = torch_nn.Module()
        self.unet.encoder.bn = torch_nn.BatchNorm2d(1, momentum=0.01)
        self.unet.encoder.layers = enc_layers
        self.unet.intermediate = torch_nn.Module()
        self.unet.intermediate.layers = inter
        self.unet.decoder = torch_nn.Module()
        self.unet.decoder.layers = dec_layers
        self.cnn = torch_nn.Conv2d(OUT_CH, 3, 3, padding=1)
        self.fc = torch_nn.Sequential(
            torch_nn.Module(),  # placeholder to get 'fc.0.gru' / 'fc.1' names
            torch_nn.Linear(512, 360),
        )
        self.fc[0].gru = torch_nn.GRU(3 * MELS, 256, num_layers=1,
                                      batch_first=True, bidirectional=True)

    def forward(self, mel):  # [B, M, T] like the reference
        x = mel.transpose(-1, -2).unsqueeze(1)  # [B, 1, T, M]
        x = self.unet.encoder.bn(x)
        skips = []
        for layer in self.unet.encoder.layers:
            skip, x = layer(x)
            skips.append(skip)
        for layer in self.unet.intermediate.layers:
            x = layer(x)
        for i, layer in enumerate(self.unet.decoder.layers):
            x = layer(x, skips[-1 - i])
        x = self.cnn(x).transpose(1, 2).flatten(-2)  # [B, T, 3*M]
        x, _ = self.fc[0].gru(x)
        return torch.sigmoid(self.fc[1](x))


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(5)
    model = TOracleRMVPE().eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch_nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    return model


def test_e2e0_parity(oracle, rng):
    state = {k: v.detach().numpy().astype(np.float32)
             for k, v in oracle.state_dict().items()}
    variables = convert_rmvpe_state_dict(
        state, en_de_layers=LAYERS, inter_layers=INTERS, n_blocks=BLOCKS)
    model = E2E0(n_blocks=BLOCKS, en_de_layers=LAYERS, inter_layers=INTERS,
                 en_out_channels=OUT_CH)

    T = 16  # multiple of 2**LAYERS
    mel = rng.standard_normal((1, T, MELS)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(mel).transpose(1, 2)).numpy()
    out = np.asarray(model.apply(variables, mel))
    assert out.shape == ref.shape == (1, T, 360)
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_local_average_decode():
    hidden = np.zeros((1, 3, 360), dtype=np.float32)
    hidden[0, 0, 100] = 0.9          # voiced, centered on bin 100
    hidden[0, 1, 100] = 0.01         # below threshold -> unvoiced
    hidden[0, 2, 100] = 0.5
    hidden[0, 2, 101] = 0.5          # split -> between bins
    f0 = local_average_cents(hidden, thred=0.03)
    cents100 = 100 * 20 + 1997.3794084376191
    assert f0[0] == pytest.approx(10 * 2 ** (cents100 / 1200), rel=1e-6)
    assert f0[1] == 0.0
    expected = 10 * 2 ** ((cents100 + 10) / 1200)
    assert f0[2] == pytest.approx(expected, rel=1e-6)


def test_viterbi_decode_smooths():
    rng = np.random.default_rng(0)
    hidden = rng.random((1, 20, 360), dtype=np.float32) * 0.1
    # strong path around bin 150 with one noisy outlier at t=10
    for t in range(20):
        hidden[0, t, 150] = 0.9
    hidden[0, 10, 150] = 0.3
    hidden[0, 10, 300] = 0.95
    f0_plain = local_average_cents(hidden.copy(), thred=0.03)
    f0_vit = viterbi_cents(hidden.copy(), thred=0.03)
    target = 10 * 2 ** ((150 * 20 + 1997.3794084376191) / 1200)
    # viterbi keeps the outlier frame near the path; plain argmax jumps
    assert abs(f0_vit[10] - target) < abs(f0_plain[10] - target)


def test_get_pitch_on_sine():
    """Random-weight RMVPE wrapper still exercises the full pipeline shape
    contract (resample -> mel -> forward -> decode -> curve resample)."""
    from some_tpu.nn.rmvpe import RMVPE
    rmvpe = RMVPE(None)  # random init
    sr = 44100
    t = np.arange(sr) / sr
    w = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    length = len(w) // 512 + 1
    f0, uv = rmvpe.get_pitch(w, sample_rate=sr, hop_size=512, length=length,
                             interp_uv=True)
    assert f0.shape == (length,)
    assert uv.shape == (length,)
    assert np.isfinite(f0).all()


# ---- bucketed forward: static-shape reuse without changing numerics ----
def test_bucket_frames_bounds_program_count():
    from some_tpu.nn.rmvpe import _bucket_frames
    seen = set()
    prev = 0
    for sem in range(32, 36000, 32):
        b = _bucket_frames(sem)
        assert b >= sem and b % 32 == 0
        assert b >= prev  # monotone in sem
        prev = b
        seen.add(b)
    # ~16 programs cover 0.3 s .. 6 min of audio at 16 kHz / hop 160
    assert len(seen) < 20


def test_t_valid_mask_equals_exact_pad(rng):
    """A bucket-padded forward with t_valid == semantic length must equal
    the exact-shape forward (the reference's pad-to-32 program)."""
    model = E2E0(n_blocks=BLOCKS, en_de_layers=LAYERS, inter_layers=INTERS,
                 en_out_channels=OUT_CH)
    sem = 64
    mel = rng.standard_normal((1, sem, MELS)).astype(np.float32)
    variables = model.init(__import__("jax").random.PRNGKey(3), mel)
    exact = np.asarray(model.apply(variables, mel))
    padded = np.pad(mel, ((0, 0), (0, 64), (0, 0)))
    bucketed = np.asarray(
        model.apply(variables, padded, t_valid=np.int32(sem)))[:, :sem]
    np.testing.assert_allclose(bucketed, exact, atol=5e-5, rtol=1e-4)
    # and with t_valid covering the whole array, masking is a no-op
    full = np.asarray(model.apply(variables, mel, t_valid=np.int32(sem)))
    np.testing.assert_allclose(full, exact, atol=5e-5, rtol=1e-4)


def test_mel2hidden_bucket_invariance():
    """RMVPE.mel2hidden returns the same probabilities whether the program
    rides a 512-frame bucket or the exact pad-32 shape."""
    from some_tpu.nn.rmvpe import RMVPE, _bucket_frames
    rng = np.random.default_rng(7)
    r = RMVPE(None)  # random init, full geometry
    n = 73           # sem = 96, bucket = 512
    assert _bucket_frames(96) == 512
    mel = rng.standard_normal((n, 128)).astype(np.float32)
    out_bucketed = r.mel2hidden(mel)
    r.bucket = False
    out_exact = r.mel2hidden(mel)
    assert out_bucketed.shape == out_exact.shape == (1, n, 360)
    np.testing.assert_allclose(out_bucketed, out_exact, atol=5e-5, rtol=1e-4)


def test_mel2hidden_batch_matches_single():
    """Batched rows (per-row t_valid) must reproduce each item's
    single-call probabilities exactly."""
    from some_tpu.nn.rmvpe import RMVPE
    rng = np.random.default_rng(11)
    r = RMVPE(None)
    mels = [rng.standard_normal((n, 128)).astype(np.float32)
            for n in (73, 150)]  # same 512 bucket, rows padded to 2
    singles = [r.mel2hidden(m) for m in mels]
    batched = r.mel2hidden_batch(mels)
    for s, b in zip(singles, batched):
        assert b.shape == s.shape
        np.testing.assert_allclose(b, s, atol=5e-5, rtol=1e-4)


def test_window_fetch_decode_is_bit_exact():
    """The device-side argmax-window fetch (_argmax_window + host
    _decode_window) must reproduce local_average_cents on the full hidden
    BIT-exactly — scattering the 9-bin window back into zeros recreates
    every value the decode's mask can select, and adding exact 0.0 terms
    never changes a float sum. Includes edge centers (argmax at bin 0 /
    N_CLASS-1), where clipped gather indices duplicate."""
    from some_tpu.nn.rmvpe import (N_CLASS, _argmax_window, _decode_window,
                                   local_average_cents)
    rng = np.random.default_rng(3)
    hidden = rng.random((1, 50, N_CLASS)).astype(np.float32) * 0.5
    hidden[0, 0, 0] = 0.9        # center at the low edge
    hidden[0, 1, N_CLASS - 1] = 0.9   # center at the high edge
    hidden[0, 7, :] = 0.001      # near-unvoiced frame (below thred)
    center, window = _argmax_window(hidden)
    got = _decode_window(np.asarray(center), np.asarray(window))
    want = local_average_cents(hidden)
    np.testing.assert_array_equal(got, want)


def test_f0_batch_matches_per_item_get_pitch():
    """f0_batch (packed rows + window fetch) must reproduce the per-item
    get_pitch f0 grid for varied lengths that land in DIFFERENT per-item
    buckets (73 -> 512, 600 -> 704): packing into the chunk-max bucket must
    not change any item's pitch curve."""
    from some_tpu.nn.rmvpe import RMVPE
    rng = np.random.default_rng(13)
    r = RMVPE(None)
    sr = 16000
    waves = [rng.standard_normal(int(sr * s)).astype(np.float32) * 0.1
             for s in (0.8, 6.0)]
    batched = r.f0_batch(waves, sr)
    singles = [r.infer_from_audio(w, sr) for w in waves]
    for b, s in zip(batched, singles):
        assert b.shape == s.shape
        np.testing.assert_allclose(b, s, atol=5e-5, rtol=1e-4)
