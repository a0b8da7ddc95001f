import numpy as np
import pytest

from some_tpu.config import deep_update, read_full_config
from some_tpu.utils.midi_file import MidiFile, build_midi_file, bpm_to_tempo
from some_tpu.utils.note_names import hz_to_midi, midi_to_hz, midi_to_note, note_to_midi
from some_tpu.utils.pitch import interp_f0, resample_align_curve


class TestNoteNames:
    @pytest.mark.parametrize("name,midi", [
        ("C4", 60), ("A4", 69), ("A#3", 58), ("Bb3", 58), ("C-1", 0),
        ("G9", 127), ("E5", 76), ("F#2", 42),
    ])
    def test_note_to_midi_round(self, name, midi):
        assert note_to_midi(name) == midi

    def test_cents(self):
        assert note_to_midi("C4+50", round_midi=False) == pytest.approx(60.5)
        assert note_to_midi("A4-25", round_midi=False) == pytest.approx(68.75)

    def test_midi_to_note_roundtrip(self):
        for m in range(0, 128):
            assert note_to_midi(midi_to_note(m)) == m

    def test_midi_to_note_cents_format(self):
        # librosa midi_to_note(60.3, cents=True, unicode=False) == 'C4+30'
        assert midi_to_note(60.3, cents=True) == "C4+30"
        assert midi_to_note(59.8, cents=True) == "C4-20"  # rounds to 60, -20 cents

    def test_midi_to_note_cents_zero(self):
        # librosa formats zero cents as '+0' ({:+02d} width includes the sign)
        assert midi_to_note(60.0, cents=True) == "C4+0"

    def test_hz_midi(self):
        assert hz_to_midi(440.0) == pytest.approx(69.0)
        assert midi_to_hz(69) == pytest.approx(440.0)
        assert hz_to_midi(261.6255653) == pytest.approx(60.0, abs=1e-6)


class TestPitchUtils:
    def test_interp_f0(self):
        f0 = np.array([0.0, 220.0, 0.0, 0.0, 440.0, 0.0], dtype=np.float32)
        out, uv = interp_f0(f0.copy())
        assert uv.tolist() == [True, False, True, True, False, True]
        assert out[1] == pytest.approx(220.0, rel=1e-6)
        assert out[4] == pytest.approx(440.0, rel=1e-6)
        # log2-domain linear interpolation between 220 and 440
        assert out[2] == pytest.approx(220 * 2 ** (1 / 3), rel=1e-5)
        assert out[3] == pytest.approx(220 * 2 ** (2 / 3), rel=1e-5)
        # extrapolated edges hold the nearest voiced value
        assert out[0] == pytest.approx(220.0, rel=1e-6)

    def test_resample_align_curve(self):
        points = np.arange(10, dtype=np.float32)
        out = resample_align_curve(points, 0.01, 0.005, 19)
        assert len(out) == 19
        # arange excludes t_max, so the 19th point pads with the last value
        expected = np.concatenate([np.arange(18) * 0.5, [8.5]])
        np.testing.assert_allclose(out, expected, rtol=1e-6)
        out_pad = resample_align_curve(points, 0.01, 0.005, 25)
        assert len(out_pad) == 25
        assert (out_pad[19:] == out_pad[18]).all()


class TestMidiFile:
    def test_roundtrip(self, tmp_path):
        mf = MidiFile()
        mf.add_tempo(120)
        mf.add_note_on(60, delta=0)
        mf.add_note_off(60, delta=480)
        mf.add_note_on(64, delta=240)
        mf.add_note_off(64, delta=480)
        path = tmp_path / "test.mid"
        mf.save(path)
        loaded = MidiFile.load(path)
        notes = loaded.notes()
        assert notes == [
            {"note": 60, "start_tick": 0, "end_tick": 480},
            {"note": 64, "start_tick": 720, "end_tick": 1200},
        ]
        assert loaded.ticks_per_beat == 480
        tempos = [e for e in loaded.events if e.kind == "set_tempo"]
        assert tempos[0].tempo == bpm_to_tempo(120)

    def test_build_midi_file(self, tmp_path):
        segments = [{
            "note_midi": np.array([60.2, 64.0, 67.0]),
            "note_dur": np.array([0.5, 0.5, 1.0]),
            "note_rest": np.array([False, True, False]),
        }]
        mf = build_midi_file([0.25], segments, tempo=120)
        path = tmp_path / "out.mid"
        mf.save(path)
        notes = MidiFile.load(path).notes()
        # tick = round(sec * 120 * 8); offset 0.25s -> 240 ticks
        assert notes == [
            {"note": 60, "start_tick": 240, "end_tick": 240 + 480},
            {"note": 67, "start_tick": 240 + 960, "end_tick": 240 + 1920},
        ]

    def test_overlap_clamp(self):
        segments = [
            {"note_midi": np.array([60.0]), "note_dur": np.array([10.0]),
             "note_rest": np.array([False])},
            {"note_midi": np.array([62.0]), "note_dur": np.array([1.0]),
             "note_rest": np.array([False])},
        ]
        mf = build_midi_file([0.0, 2.0], segments, tempo=120)
        notes = mf.notes()
        assert notes[0]["end_tick"] == round(2.0 * 120 * 8)  # clamped


class TestConfig:
    def test_deep_update(self):
        base = {"a": 1, "b": {"c": 2, "d": 3}}
        deep_update(base, {"b": {"c": 9}, "e": 5})
        assert base == {"a": 1, "b": {"c": 9, "d": 3}, "e": 5}

    def test_cascade(self, tmp_path):
        (tmp_path / "base.yaml").write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
        (tmp_path / "child.yaml").write_text(
            f"base_config:\n  - {tmp_path}/base.yaml\na: 2\nnested:\n  y: 3\n")
        cfg = read_full_config(tmp_path / "child.yaml")
        assert cfg == {"a": 2, "nested": {"x": 1, "y": 3}}


class TestSinusoidalSmoothing:
    """Torch-oracle parity for the half-sine FIR smoother
    (reference: utils/binarizer_utils.py:125-140)."""

    def _oracle(self, curve, kernel_size):
        import torch

        conv = torch.nn.Conv1d(1, 1, kernel_size, bias=False,
                               padding="same", padding_mode="replicate")
        k = torch.sin(torch.from_numpy(
            np.linspace(0, 1, kernel_size).astype(np.float32) * np.pi))
        k /= k.sum()
        conv.weight.data = k[None, None]
        with torch.no_grad():
            out = conv(torch.from_numpy(curve)[None, None])
        return out[0, 0].numpy()

    def test_matches_torch_oracle(self):
        from some_tpu.preprocessing.label_utils import sinusoidal_smoothing

        rng = np.random.default_rng(7)
        curve = (rng.standard_normal(200) * 50 + 300).astype(np.float32)
        for kernel_size in (3, 5, 7, 15):  # torch 'same' requires odd K
            got = sinusoidal_smoothing(curve, kernel_size)
            want = self._oracle(curve, kernel_size)
            np.testing.assert_allclose(got, want, atol=2e-4), kernel_size

    def test_preserves_constant_and_mean(self):
        from some_tpu.preprocessing.label_utils import sinusoidal_smoothing

        const = np.full(64, 440.0, np.float32)
        np.testing.assert_allclose(sinusoidal_smoothing(const, 9), const,
                                   rtol=1e-6)
        # kernel sums to 1: interior mean is preserved
        rng = np.random.default_rng(1)
        curve = rng.standard_normal(512).astype(np.float32)
        sm = sinusoidal_smoothing(curve, 9)
        np.testing.assert_allclose(sm[8:-8].mean(), curve[4:-4].mean(),
                                   atol=2e-2)

    def test_degenerate_inputs(self):
        from some_tpu.preprocessing.label_utils import sinusoidal_smoothing

        np.testing.assert_array_equal(
            sinusoidal_smoothing(np.asarray([1.0, 2.0], np.float32), 1),
            np.asarray([1.0, 2.0], np.float32))
        assert sinusoidal_smoothing(np.zeros(0, np.float32), 5).size == 0


class TestPlotHelpers:
    """Every figure helper renders without error (reference: utils/plot.py).
    dur_to_figure is dead code upstream (defined, never called) but ported
    for symbol completeness — the smoke test keeps it alive here."""

    def test_all_figures_render(self):
        import matplotlib.pyplot as plt

        from some_tpu.utils import plot

        rng = np.random.default_rng(3)
        figs = [
            plot.spec_to_figure(rng.random((64, 32))),
            plot.dur_to_figure(
                rng.integers(1, 20, 12), rng.integers(1, 20, 12),
                [f"w{i}" for i in range(12)]),
            plot.boundary_to_figure(
                rng.random(100) < 0.1, rng.random(100),
                dur_gt=np.asarray([30, 40, 30]),
                dur_pred=np.asarray([28, 44, 28])),
            plot.pitch_notes_to_figure(
                60 + rng.standard_normal(100),
                np.asarray([60.0, 62.0]), np.asarray([50, 50]),
                np.asarray([False, False]),
                np.asarray([60.5, 61.5]), np.asarray([48, 52]),
                np.asarray([False, False])),
            plot.curve_to_figure(rng.random(50), rng.random(50)),
            plot.distribution_to_figure(
                "midi", "pitch", "count", ["C4", "D4"], [3, 5]),
        ]
        for fig in figs:
            assert fig is not None
            fig.canvas.draw()  # force an actual Agg render
            plt.close(fig)

    def test_dur_to_figure_single_token(self):
        import matplotlib.pyplot as plt

        from some_tpu.utils.plot import dur_to_figure

        fig = dur_to_figure(np.asarray([10]), np.asarray([12]), ["la"])
        fig.canvas.draw()
        plt.close(fig)
