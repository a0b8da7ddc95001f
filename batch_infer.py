"""Batch inference over a DiffSinger dataset: label transcriptions.csv with
note_seq/note_dur aligned to word boundaries.

Behavioral parity with the reference (reference: batch_infer.py:15-230):
slice each wav, infer notes, flatten chunks to absolute time, snap note edges
to word boundaries derived from ph_dur/ph_num (+-50 ms), then fill each word
window either with the max-overlap note (--round_midi) or all overlapping
notes plus rest padding.
"""
from __future__ import annotations

import pathlib
from csv import DictReader, DictWriter
from typing import List

import click


def calc_seq(note_midi: float, note_rest: bool) -> str:
    """float MIDI -> 'NoteName(+/-cents)' label (reference: batch_infer.py:37-46)."""
    from some_tpu.utils.note_names import midi_to_note

    if note_rest:
        return "rest"
    midi_num = round(note_midi, 0)
    cent = int(round(note_midi - midi_num, 2) * 100)
    cent_str = f"+{cent}" if cent > 0 else (str(cent) if cent < 0 else "")
    return f"{midi_to_note(midi_num, unicode=False)}{cent_str}"


def infer_song(wav_path, engine, config) -> List[dict]:
    """One wav -> absolute-time note list (reference: batch_infer.py:49-81)."""
    from some_tpu.audio.wavio import load_wav
    from some_tpu.inference.pipeline import slice_waveform

    waveform, _ = load_wav(wav_path, sr=config["audio_sample_rate"], mono=True)
    chunks = slice_waveform(waveform, config["audio_sample_rate"])
    segments = engine.infer([c["waveform"] for c in chunks])

    res: List[dict] = []
    for chunk, segment in zip(chunks, segments):
        offset = round(chunk["offset"], 6)
        last_time = 0.0
        for mid, dur, rest in zip(segment["note_midi"].tolist(),
                                  segment["note_dur"].tolist(),
                                  segment["note_rest"].tolist()):
            dur = round(dur, 6)
            last_time = round(last_time, 6)
            info = {
                "start_time": round(offset + last_time, 6),
                "end_time": round(offset + last_time + dur, 6),
                "note_seq": calc_seq(mid, rest),
            }
            if res and info["start_time"] < res[-1]["end_time"]:
                info["start_time"] = res[-1]["end_time"]
            info["note_dur"] = round(info["end_time"] - info["start_time"], 6)
            res.append(info)
            last_time += dur
    return res


def word_windows(ph_durs: List[float], ph_nums: List[int]):
    """Word time windows from phoneme durations (reference: batch_infer.py:84-94)."""
    windows = []
    cursor = 0
    start = 0.0
    for count in ph_nums:
        word_dur = round(sum(ph_durs[cursor:cursor + count]), 6)
        windows.append((round(start, 6), round(start + word_dur, 6)))
        cursor += count
        start += word_dur
    return windows


def align_to_words(notes: List[dict], windows, tolerance: float = 0.05) -> List[dict]:
    """Snap note edges to word bounds within +-tolerance; drop zero-duration
    notes (reference: batch_infer.py:97-110)."""
    bounds = [w[0] for w in windows] + [windows[-1][1]]
    out = []
    for note in notes:
        for b in bounds:
            if b - tolerance <= note["start_time"] <= b + tolerance:
                note["start_time"] = b
            if b - tolerance <= note["end_time"] <= b + tolerance:
                note["end_time"] = b
        note["note_dur"] = round(note["end_time"] - note["start_time"], 6)
        if note["note_dur"] > 0:
            out.append(note)
    return out


def overlapping_notes(interval, notes):
    """All notes overlapping a word window (reference: batch_infer.py:113-121)."""
    lo, hi = interval
    out = []
    for n in notes:
        if (lo < n["start_time"] < hi or lo < n["end_time"] < hi
                or (n["start_time"] <= lo and hi <= n["end_time"])):
            out.append(n)
    return out


def max_overlap_note(interval, notes) -> str:
    """Label of the note with max overlap, or 'rest'
    (reference: batch_infer.py:124-134)."""
    best, best_overlap = "rest", 0.0
    for n in notes:
        overlap = max(0.0, min(interval[1], n["end_time"])
                      - max(interval[0], n["start_time"]))
        if overlap > best_overlap:
            best_overlap = overlap
            best = n["note_seq"]
    return best


def label_row(row: dict, notes: List[dict], round_midi: bool) -> None:
    """Fill row['note_seq'/'note_dur'] from the note list
    (reference: batch_infer.py:170-219)."""
    ph_dur = [round(float(x), 6) for x in row["ph_dur"].split(" ")]
    ph_num = [int(x) for x in row["ph_num"].split(" ")]
    windows = word_windows(ph_dur, ph_num)
    notes = align_to_words(notes, windows)

    note_seq: List[str] = []
    note_dur: List[float] = []
    for (start, end) in windows:
        word_dur = round(end - start, 6)
        if round_midi:
            note_seq.append(max_overlap_note((start, end), notes))
            note_dur.append(word_dur)
            continue
        seq: List[str] = []
        durs: List[float] = []
        for note in overlapping_notes((start, end), notes):
            if note["start_time"] <= start:
                seq.append(note["note_seq"])
                durs.append(round(min(end, note["end_time"]) - start, 6))
            elif note["end_time"] >= end:
                seq.append(note["note_seq"])
                durs.append(round(end - max(start, note["start_time"]), 6))
            else:
                seq.append(note["note_seq"])
                durs.append(round(note["note_dur"], 6))
        if not seq:
            seq.append("rest")
            durs.append(word_dur)
        if round(sum(durs), 6) < word_dur:
            seq.append("rest")
            durs.append(word_dur - round(sum(durs), 6))
        note_seq.extend(seq)
        note_dur.extend(durs)

    assert len(note_seq) == len(note_dur)
    row["note_seq"] = " ".join(str(x) for x in note_seq)
    row["note_dur"] = " ".join(str(round(x, 6)) for x in note_dur)


@click.command(help="Batch inference on an existing DiffSinger dataset.")
@click.option("--dataset", required=True, metavar="RAW_DATA_DIR",
              help="Dataset directory (the DiffSinger raw_data_dir)")
@click.option("--model", required=True, metavar="CKPT_PATH",
              help="Path to the model checkpoint (*.ckpt)")
@click.option("--round_midi", is_flag=True, help="Round MIDI values to integers")
@click.option("--csv", required=False, metavar="CSV_PATH",
              help="Output transcriptions.csv (default: in the dataset)")
@click.option("--overwrite", is_flag=True, help="Overwrite an existing output csv")
@click.option("--devices", required=False, type=int, default=1,
              help="Data-parallel serving over N local devices")
def batch_infer(dataset, model, round_midi, csv, overwrite, devices):
    import tqdm
    import yaml

    from some_tpu.config import print_config
    from some_tpu.inference.base_infer import build_inference

    data_path = pathlib.Path(dataset)
    model_path = pathlib.Path(model)
    csv_path = pathlib.Path(csv) if csv is not None else data_path / "transcriptions.csv"
    if csv_path.exists() and not overwrite:
        raise FileExistsError(
            f"The CSV path '{csv_path}' already exists. Re-try with --overwrite.")
    with open(model_path.with_name("config.yaml"), "r", encoding="utf8") as f:
        config = yaml.safe_load(f)
    print_config(config)
    kwargs = {}
    if devices > 1:
        import jax

        from some_tpu.parallel.mesh import make_mesh
        kwargs["mesh"] = make_mesh(jax.devices()[:devices])
    engine = build_inference(config, model_path, **kwargs)

    with open(data_path / "transcriptions.csv", "r", encoding="utf8", newline="") as f:
        rows = list(DictReader(f))

    for row in tqdm.tqdm(rows):
        wav = data_path / "wavs" / f"{row['name']}.wav"
        if not wav.exists():
            print(f"WARNING: audio file does not exist: '{wav}'")
            continue
        notes = infer_song(wav, engine, config)
        label_row(row, notes, round_midi)

    with open(csv_path, "w", encoding="utf8", newline="") as f:
        writer = DictWriter(f, fieldnames=["name", "ph_seq", "ph_dur", "ph_num",
                                           "note_seq", "note_dur"])
        writer.writeheader()
        writer.writerows(rows)


if __name__ == "__main__":
    batch_infer()
