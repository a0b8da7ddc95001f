"""Binarize throughput on the real chip: songs/min and the mel/RMVPE split.

SURVEY §7.3 flags the RMVPE BiGRU scan as the binarize latency risk — the
reference's binarizer runs a second neural forward per item
(reference: modules/rmvpe/inference.py:56-66). This times the full
MIDIExtractionBinarizer.process() over a synthetic dataset of VARIED song
lengths with ``pe: rmvpe`` + mel units (random RMVPE weights: identical
FLOPs to the published checkpoint), split into:

  units_mel_s      host mel frontend for the units (incl. key-shift aug)
  rmvpe_s          the whole pitch path (16 kHz mel + forward + decode)
  rmvpe_forward_s  just mel2hidden (the TPU leg: transfer + E2E0 forward)
  host_other_s     labels, alignment, HDF5, everything else

Varied lengths exercise the frame-bucketing in RMVPE.mel2hidden: without it
(--no-bucket) every distinct song length is a fresh XLA program through the
multi-minute remote compiler. ``rmvpe_programs`` counts distinct compiled
shapes either way.

  timeout 2400 python tools/bench_binarize.py [--items 8] [--no-bucket]

Prints one JSON line. The hang-prone tunnel is handled like bench.py: a
watchdog emits a timeout sentinel and hard-exits after SOME_BENCH_TIMEOUT
seconds (default 1800).
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np

SR = 44100


def _watchdog(seconds: float):
    from tools._bench_util import start_watchdog
    return start_watchdog(seconds, {
        "metric": "binarize_rtf", "value": 0.0, "unit": "timeout-sentinel",
        "error": f"watchdog fired after {seconds}s"})


def write_song_dataset(root: pathlib.Path, rng, seconds_list):
    """Synthetic sung-ish songs, one per requested length (varied lengths
    are the point: they exercise the per-shape compile story)."""
    wavs = root / "wavs"
    wavs.mkdir(parents=True)
    rows = []
    for i, total in enumerate(seconds_list):
        name = f"song{i}"
        # alternating note/rest pattern filling `total` seconds
        note_seq, note_dur = [], []
        t_acc, k = 0.0, 0
        pitches = ["A3", "C4", "E4", "G3", "B3"]
        while t_acc < total - 0.4:
            dur = 0.3 + 0.5 * rng.random()
            if k % 5 == 4:
                note_seq.append("rest")
            else:
                note_seq.append(pitches[k % len(pitches)])
            note_dur.append(round(dur, 3))
            t_acc += dur
            k += 1
        note_dur[-1] = round(note_dur[-1] + (total - t_acc), 3)
        t = np.arange(int(SR * total)) / SR
        freq = np.zeros_like(t)
        t0 = 0.0
        for n, d in zip(note_seq, note_dur):
            if n != "rest":
                semitone = {"A3": 220.0, "C4": 261.6, "E4": 329.6,
                            "G3": 196.0, "B3": 246.9}[n]
                freq[(t >= t0) & (t < t0 + d)] = semitone
            t0 += d
        vib = 1 + 0.003 * np.sin(2 * np.pi * 5 * t)
        wave = 0.4 * np.sin(2 * np.pi * np.cumsum(freq * vib) / SR)
        wave *= (freq > 0)
        wave += 0.002 * rng.standard_normal(len(wave))
        from some_tpu.audio.wavio import save_wav
        save_wav(wavs / f"{name}.wav", wave.astype(np.float32), SR)
        ds = [{"note_seq": " ".join(note_seq),
               "note_dur": " ".join(str(d) for d in note_dur),
               "note_slur": " ".join("0" for _ in note_seq)}]
        (wavs / f"{name}.ds").write_text(json.dumps(ds))
        rows.append({"name": name,
                     "ph_seq": " ".join("a" for _ in note_seq),
                     "ph_dur": " ".join(str(d) for d in note_dur),
                     "ph_num": " ".join("1" for _ in note_seq)})
    with open(root / "transcriptions.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["name", "ph_seq", "ph_dur", "ph_num"])
        w.writeheader()
        w.writerows(rows)
    return float(sum(seconds_list))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=8)
    ap.add_argument("--min-s", type=float, default=4.0)
    ap.add_argument("--max-s", type=float, default=30.0)
    ap.add_argument("--no-bucket", action="store_true",
                    help="disable RMVPE frame bucketing (exact pad-32 "
                    "shapes: one compile per distinct song length)")
    ap.add_argument("--no-batch", action="store_true",
                    help="disable the serial-path batched-pitch prepare "
                    "pass (per-item RMVPE forwards, the pre-r4 shape)")
    ap.add_argument("--aug", type=int, default=1,
                    help="key_shift_factor (mel recomputes per train item)")
    ap.add_argument("--passes", type=int, default=1,
                    help="re-run process() in the SAME process; the last "
                    "pass is the steady state a long dataset sees (RMVPE "
                    "programs live — a persistent-cache HIT still costs "
                    "~35 s/program of remote executable load per process, "
                    "measured .bench_logs/rmvpe_profile3_r5.json, so tiny "
                    "corpora understate real-corpus throughput)")
    args = ap.parse_args()

    watchdog = _watchdog(float(os.environ.get("SOME_BENCH_TIMEOUT", 1800)))

    import some_tpu  # noqa: F401
    from some_tpu.nn.rmvpe import RMVPE
    from some_tpu.preprocessing.me_binarizer import MIDIExtractionBinarizer

    rng = np.random.default_rng(42)
    root = pathlib.Path("/tmp/some_tpu_bench_binarize/raw")
    binary = pathlib.Path("/tmp/some_tpu_bench_binarize/binary")
    shutil.rmtree(root.parent, ignore_errors=True)
    binary.mkdir(parents=True)
    seconds_list = list(np.round(
        np.linspace(args.min_s, args.max_s, args.items), 1))
    audio_seconds = write_song_dataset(root, rng, seconds_list)

    # random-weights RMVPE preloaded into the class cache (same FLOPs as the
    # published ckpt; the zero-egress image has no way to fetch the real one)
    fake_ckpt = "bench://rmvpe-random"
    rmvpe = RMVPE(None, bucket=not args.no_bucket)
    RMVPE._cache[fake_ckpt] = rmvpe

    # ---- timing instrumentation (serial: num_workers=0) ----
    acc = {"units": 0.0, "rmvpe": 0.0, "fwd": 0.0}
    shapes = set()

    def timed(fn, key):
        def wrapper(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            acc[key] += time.perf_counter() - t0
            return out
        return wrapper

    orig_units = MIDIExtractionBinarizer.compute_units
    orig_pitch = RMVPE.get_pitch
    orig_f0b = RMVPE.f0_batch
    orig_fwd = RMVPE.mel2hidden
    orig_fwdb = RMVPE.mel2hidden_batch
    orig_grid = RMVPE.__dict__["f0_to_grid"]  # staticmethod object
    MIDIExtractionBinarizer.compute_units = timed(orig_units, "units")
    RMVPE.get_pitch = timed(orig_pitch, "rmvpe")
    RMVPE.f0_batch = timed(orig_f0b, "rmvpe")
    # in batched mode the per-item grid resample runs OUTSIDE f0_batch
    # (from _extract_pitch's cache hit); time it into the rmvpe accumulator
    # so the split is A/B comparable with --no-batch, where get_pitch
    # already includes it (ADVICE r4). Only wrap in batched mode: in
    # --no-batch the wrapped get_pitch calls f0_to_grid internally, and a
    # nested wrapper would add the grid time to acc['rmvpe'] TWICE
    # (inflating rmvpe_s and understating host_other_s, code-review r5)
    if not args.no_batch:
        RMVPE.f0_to_grid = staticmethod(timed(orig_grid.__func__, "rmvpe"))

    # count REAL dispatched programs: every distinct (rows, frames) shape
    # entering the jitted forward (the pre-r5 counter tallied per-ITEM
    # buckets, which over-counts once packing shares one program across
    # buckets and under-counts row-bucket variants)
    fwd_calls = []

    def counted(inner):
        def counting_forward(variables, mel, t_valid):
            shapes.add(mel.shape[:2])
            fwd_calls.append(mel.shape[:2])
            t0 = time.perf_counter()
            out = inner(variables, mel, t_valid)
            # fetch a byte: the axon backend is LAZY and block_until_ready
            # alone can return before execution (CLAUDE.md; phantom sub-ms
            # forwards) — without the fetch the device wait would land in
            # the enclosing f0_batch/get_pitch timer and mis-attribute
            # chip time to the host plane (code-review r5)
            leaf = __import__("jax").tree_util.tree_leaves(out)[0]
            np.asarray(leaf[tuple(0 for _ in leaf.shape)])  # 1-elem fetch
            acc["fwd"] += time.perf_counter() - t0
            return out
        return counting_forward
    rmvpe._forward = counted(rmvpe._forward)
    rmvpe._forward_window = counted(rmvpe._forward_window)

    # (mel2hidden/mel2hidden_batch need no extra wrapper: both funnel into
    # the counted jitted forwards above, as does f0_batch's window path)

    config = {
        "raw_data_dir": [str(root)], "binary_data_dir": str(binary),
        "binarization_args": {"num_workers": 0, "shuffle": True,
                              "skip_glide": True, "merge_rest": True,
                              "merge_slur": True, "round_midi": False,
                              "slur_tolerance": 0.5},
        "audio_sample_rate": SR, "hop_size": 512, "win_size": 2048,
        "fmin": 40, "fmax": 8000, "units_dim": 128, "units_encoder": "mel",
        "pe": "rmvpe", "pe_ckpt": fake_ckpt,
        "key_shift_factor": args.aug, "key_shift_range": [-3, 3],
        "test_prefixes": ["song0"], "seed": 1,
        "midi_min": 0, "midi_max": 127,
    }

    passes = []
    for i in range(max(1, args.passes)):
        if i:
            shutil.rmtree(binary, ignore_errors=True)
            binary.mkdir(parents=True)
            for key in acc:
                acc[key] = 0.0
            fwd_calls.clear()
        binarizer = MIDIExtractionBinarizer(dict(config))
        if args.no_batch:
            binarizer.prepare_items = None  # shadow hook -> per-item path
        t0 = time.perf_counter()
        binarizer.process()
        passes.append({"wall_s": round(time.perf_counter() - t0, 2),
                       "split": {k: round(v, 2) for k, v in acc.items()},
                       "forwards": len(fwd_calls)})
    wall = passes[0]["wall_s"]
    acc = {"units": passes[0]["split"]["units"],
           "rmvpe": passes[0]["split"]["rmvpe"],
           "fwd": passes[0]["split"]["fwd"]}

    MIDIExtractionBinarizer.compute_units = orig_units
    RMVPE.get_pitch = orig_pitch
    RMVPE.f0_batch = orig_f0b
    RMVPE.mel2hidden = orig_fwd
    RMVPE.mel2hidden_batch = orig_fwdb
    RMVPE.f0_to_grid = staticmethod(orig_grid.__func__)
    watchdog.cancel()

    host_other = wall - acc["units"] - acc["rmvpe"]
    steady = {}
    if len(passes) > 1:
        last = passes[-1]
        steady = {
            "steady_rtf": round(audio_seconds / last["wall_s"], 2),
            "steady_wall_s": last["wall_s"],
            "steady_split": {
                "units_mel_s": last["split"]["units"],
                "rmvpe_s": last["split"]["rmvpe"],
                "rmvpe_forward_s": last["split"]["fwd"],
                "host_other_s": round(last["wall_s"] - last["split"]["units"]
                                      - last["split"]["rmvpe"], 2)},
            "steady_forwards": last["forwards"],
        }
    print(json.dumps({
        "metric": "binarize_rtf",
        "value": round(audio_seconds / wall, 2),
        "unit": "audio-sec/sec, raw->HDF5 incl. RMVPE pitch",
        "songs_per_min": round(args.items / wall * 60, 2),
        "items": args.items,
        "audio_seconds": round(audio_seconds, 1),
        "wall_s": round(wall, 2),
        "split": {"units_mel_s": round(acc["units"], 2),
                  "rmvpe_s": round(acc["rmvpe"], 2),
                  "rmvpe_forward_s": round(acc["fwd"], 2),
                  "host_other_s": round(host_other, 2)},
        "rmvpe_programs": len(shapes),
        "rmvpe_forwards": passes[0]["forwards"],
        "rmvpe_shapes": sorted(str(s) for s in shapes),
        **steady,
        "bucket": not args.no_bucket,
        "batched_pitch": not args.no_batch,
        "aug_factor": args.aug,
        "platform": __import__("jax").devices()[0].platform,
    }), flush=True)


if __name__ == "__main__":
    main()
