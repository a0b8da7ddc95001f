"""RMS-based silence slicer (host plane).

Splits a waveform at silent stretches so the model never attends across a
whole song; behavioral twin of the reference slicer
(reference: utils/slicer2.py:41-145; defaults -40 dB threshold, 5 s min
length, 300 ms min interval, max_sil_kept in ms). The RMS envelope here is
computed with a cumulative-sum-of-squares scan instead of stride tricks —
O(n) and branch-free — but yields the same values.
"""
from __future__ import annotations

import numpy as np


def rms_envelope(y: np.ndarray, frame_length: int = 2048, hop_length: int = 512) -> np.ndarray:
    """Centered RMS per frame, matching librosa-style framing."""
    pad = frame_length // 2
    y = np.pad(y, (pad, pad), mode="constant")
    sq = np.concatenate(([0.0], np.cumsum(y.astype(np.float64) ** 2)))
    starts = np.arange(0, len(y) - frame_length + 1, hop_length)
    power = (sq[starts + frame_length] - sq[starts]) / frame_length
    return np.sqrt(power)


class _SliceScanner:
    """Incremental form of the silence-tag scan (python twin of the native
    C++ scan; reference semantics: utils/slicer2.py:59-121).

    Every split decision at frame i reads only rms[0..i], so the exact
    offline algorithm runs frame-by-frame: `feed` returns the (start, end)
    silence tags decided so far, `finish` applies the trailing-silence rule.
    This is what makes live streaming possible — StreamingTranscriber
    (some_tpu/inference/streaming.py) drives the same scanner the offline
    slicer uses, guaranteeing identical chunk boundaries.
    """

    def __init__(self, threshold: float, min_interval: int, min_length: int,
                 max_sil_kept: int):
        self.threshold = threshold
        self.min_interval = min_interval
        self.min_length = min_length
        self.max_sil_kept = max_sil_kept
        self._rms: list = []
        self._rms_base = 0   # absolute frame index of _rms[0]
        self._silence_start = None
        self._clip_start = 0
        self._i = 0

    @property
    def n_frames(self) -> int:
        return self._i

    def _amin(self, a: int, b: int) -> int:
        """argmin of rms[a:b] as an absolute frame index."""
        seg = self._rms[a - self._rms_base:b - self._rms_base]
        return a + int(np.argmin(seg))

    def compact(self) -> None:
        """Drop RMS frames no future decision can read: every argmin window
        starts at the current silence stretch's start (or cannot start
        before the present frame when we are not inside silence). Keeps a
        live stream's scanner state O(current silence) instead of O(stream).
        Offline callers never need this — they feed once and discard."""
        keep_from = self._i if self._silence_start is None \
            else self._silence_start
        drop = keep_from - self._rms_base
        if drop >= 1 << 12:   # amortize list reshuffles
            del self._rms[:drop]
            self._rms_base = keep_from

    def _step(self, level: float):
        """Process one RMS frame; returns a (start, end) tag or None."""
        i = self._i
        self._rms.append(float(level))
        self._i = i + 1
        if level < self.threshold:
            if self._silence_start is None:
                self._silence_start = i
            return None
        if self._silence_start is None:
            return None
        # A silent stretch [silence_start, i) just ended at a loud frame.
        ss = self._silence_start
        msk = self.max_sil_kept
        is_leading_silence = ss == 0 and i > msk
        need_slice_middle = (i - ss >= self.min_interval
                             and i - self._clip_start >= self.min_length)
        if not is_leading_silence and not need_slice_middle:
            self._silence_start = None
            return None
        if i - ss <= msk:
            pos = self._amin(ss, i + 1)
            tag = (0, pos) if ss == 0 else (pos, pos)
            self._clip_start = pos
        elif i - ss <= msk * 2:
            pos = self._amin(i - msk, ss + msk + 1)
            pos_l = self._amin(ss, ss + msk + 1)
            pos_r = self._amin(i - msk, i + 1)
            if ss == 0:
                tag = (0, pos_r)
                self._clip_start = pos_r
            else:
                tag = (min(pos_l, pos), max(pos_r, pos))
                self._clip_start = max(pos_r, pos)
        else:
            pos_l = self._amin(ss, ss + msk + 1)
            pos_r = self._amin(i - msk, i + 1)
            tag = (0, pos_r) if ss == 0 else (pos_l, pos_r)
            self._clip_start = pos_r
        self._silence_start = None
        return tag

    def feed(self, levels) -> list:
        tags = []
        for level in levels:
            tag = self._step(level)
            if tag is not None:
                tags.append(tag)
        return tags

    def finish(self) -> list:
        total_frames = self._i
        ss = self._silence_start
        if ss is not None and total_frames - ss >= self.min_interval:
            silence_end = min(total_frames, ss + self.max_sil_kept)
            pos = self._amin(ss, silence_end + 1)
            return [(pos, total_frames + 1)]
        return []


class SilenceSlicer:
    def __init__(self, sr: int, threshold: float = -40.0, min_length: int = 5000,
                 min_interval: int = 300, hop_size: int = 20, max_sil_kept: int = 5000):
        if not min_length >= min_interval >= hop_size:
            raise ValueError("min_length >= min_interval >= hop_size required")
        if not max_sil_kept >= hop_size:
            raise ValueError("max_sil_kept >= hop_size required")
        min_interval_samples = sr * min_interval / 1000
        self.sr = sr
        self.threshold = 10 ** (threshold / 20.0)
        self.hop_size = round(sr * hop_size / 1000)
        self.win_size = min(round(min_interval_samples), 4 * self.hop_size)
        self.min_length = round(sr * min_length / 1000 / self.hop_size)
        self.min_interval = round(min_interval_samples / self.hop_size)
        self.max_sil_kept = round(sr * max_sil_kept / 1000 / self.hop_size)

    def _chunk(self, waveform: np.ndarray, begin: int, end: int) -> dict:
        start_sample = begin * self.hop_size
        end_sample = min(waveform.shape[-1], end * self.hop_size)
        if waveform.ndim > 1:
            piece = waveform[:, start_sample:end_sample]
        else:
            piece = waveform[start_sample:end_sample]
        return {"offset": start_sample / self.sr, "waveform": piece}

    def slice(self, waveform: np.ndarray) -> list:
        samples = waveform.mean(axis=0) if waveform.ndim > 1 else waveform
        if (samples.shape[0] + self.hop_size - 1) // self.hop_size <= self.min_length:
            return [{"offset": 0, "waveform": waveform}]

        # native C++ scan when available (some_tpu/native), python otherwise
        try:
            from some_tpu.native import rms_envelope_native, slicer_scan_native
            rms = rms_envelope_native(samples, self.win_size, self.hop_size)
            if rms is not None:
                tags = slicer_scan_native(
                    rms, self.threshold, self.min_interval, self.min_length,
                    self.max_sil_kept)
                if tags is not None:
                    return self._apply_tags(waveform, tags, rms.shape[0])
        except Exception:
            pass
        rms = rms_envelope(samples, frame_length=self.win_size, hop_length=self.hop_size)
        tags = self._scan_python(rms)
        return self._apply_tags(waveform, tags, rms.shape[0])

    def _scan_python(self, rms: np.ndarray) -> list:
        scanner = _SliceScanner(self.threshold, self.min_interval,
                                self.min_length, self.max_sil_kept)
        tags = scanner.feed(rms)
        tags.extend(scanner.finish())
        return tags

    def _apply_tags(self, waveform: np.ndarray, sil_tags: list,
                    total_frames: int) -> list:
        if not sil_tags:
            return [{"offset": 0, "waveform": waveform}]
        chunks = []
        if sil_tags[0][0] > 0:
            chunks.append(self._chunk(waveform, 0, sil_tags[0][0]))
        for a, b in zip(sil_tags[:-1], sil_tags[1:]):
            chunks.append(self._chunk(waveform, a[1], b[0]))
        if sil_tags[-1][1] < total_frames:
            chunks.append(self._chunk(waveform, sil_tags[-1][1], total_frames))
        return chunks
