"""End-to-end learning smoke: synthesize a dataset, binarize, train, measure.

Proves the full stack learns: synthetic "singing" (sine tones at labeled
note pitches with vibrato + noise) -> binarize.py pipeline -> Trainer ->
midi_acc well above chance. Not a unit test (minutes of wall clock); run:

    SOME_TPU_PLATFORM=cpu python tools/smoke_train.py --steps 200
"""
import argparse
import csv
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

SR = 44100


def synth_song(rng, notes, durs):
    from some_tpu.utils.note_names import midi_to_hz

    total = sum(durs)
    n = int(SR * total)
    t = np.arange(n) / SR
    freq = np.zeros(n)
    cursor = 0.0
    for midi, dur in zip(notes, durs):
        lo, hi = int(cursor * SR), int((cursor + dur) * SR)
        freq[lo:hi] = 0.0 if midi is None else midi_to_hz(midi)
        cursor += dur
    vib = 1 + 0.004 * np.sin(2 * np.pi * 5.5 * t)
    wave = 0.4 * np.sin(2 * np.pi * np.cumsum(freq * vib) / SR) * (freq > 0)
    wave += 0.003 * rng.standard_normal(n)
    return wave.astype(np.float32)


def make_dataset(root: pathlib.Path, rng, n_items=12, max_notes=9):
    from some_tpu.audio.wavio import save_wav
    from some_tpu.utils.note_names import midi_to_note

    wavs = root / "wavs"
    wavs.mkdir(parents=True)
    rows = []
    for i in range(n_items):
        lo = min(4, max_notes)
        n_notes = int(rng.integers(lo, max_notes + 1))
        notes, names, durs = [], [], []
        for _ in range(n_notes):
            if rng.random() < 0.2:
                notes.append(None)
                names.append("rest")
            else:
                midi = float(rng.integers(52, 76)) + round(float(rng.uniform(-0.3, 0.3)), 2)
                notes.append(midi)
                names.append(midi_to_note(midi, cents=True, unicode=False))
            durs.append(round(float(rng.uniform(0.25, 0.7)), 3))
        name = f"song{i}"
        save_wav(wavs / f"{name}.wav", synth_song(rng, notes, durs), SR)
        (wavs / f"{name}.ds").write_text(json.dumps([{
            "note_seq": " ".join(names),
            "note_dur": " ".join(str(d) for d in durs),
            "note_slur": " ".join("0" for _ in durs),
        }]))
        rows.append({"name": name, "ph_seq": "a", "ph_dur": str(sum(durs)),
                     "ph_num": "1"})
    with open(root / "transcriptions.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["name", "ph_seq", "ph_dur", "ph_num"])
        writer.writeheader()
        writer.writerows(rows)


def eval_unseen(base: pathlib.Path, work: pathlib.Path,
                config: dict | None = None) -> dict:
    """Generalization check: transcribe an UNSEEN synthetic song (fresh RNG
    seed) through the real `infer.py` CLI with the newest checkpoint, and
    score note F1 against the ground-truth labels (the round-2 manual
    harness, BENCH_NOTES 'Learning proof — PRODUCTION geometry', now
    scripted)."""
    import subprocess

    from some_tpu.audio.wavio import save_wav
    from some_tpu.training.checkpoint import latest_checkpoint
    from some_tpu.utils.midi_file import build_midi_file
    from some_tpu.utils.note_f1 import note_f1

    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    from compare_midi import midi_notes_to_arrays

    rng = np.random.default_rng(777)  # disjoint from the training seed
    notes, durs, rests = [], [], []
    for _ in range(24):
        rest = rng.random() < 0.2
        rests.append(rest)
        notes.append(60.0 if rest else
                     float(rng.integers(52, 76))
                     + round(float(rng.uniform(-0.3, 0.3)), 2))
        durs.append(round(float(rng.uniform(0.25, 0.7)), 3))
    wav = base / "unseen.wav"
    save_wav(wav, synth_song(
        rng, [None if r else n for n, r in zip(notes, rests)], durs), SR)
    truth = base / "unseen_truth.mid"
    build_midi_file([0.0], [{
        "note_midi": np.asarray(notes), "note_dur": np.asarray(durs),
        "note_rest": np.asarray(rests)}], tempo=120).save(truth)

    ckpt = latest_checkpoint(work)
    if config is not None and not (work / "config.yaml").exists():
        import yaml
        with open(work / "config.yaml", "w", encoding="utf8") as f:
            yaml.safe_dump(config, f)  # infer.py reads it next to the ckpt
    pred = base / "unseen_pred.mid"
    subprocess.run([sys.executable, str(repo / "infer.py"), "--model",
                    str(ckpt), "--wav", str(wav), "--midi", str(pred)],
                   check=True, timeout=1800)
    ref_arrays, _ = midi_notes_to_arrays(str(truth))
    pred_arrays, _ = midi_notes_to_arrays(str(pred))
    out = {}
    for tol in (0.05, 0.1, 0.2):
        r = note_f1(ref_arrays, pred_arrays, onset_tolerance=tol,
                    pitch_tolerance=0.5)
        out[tol] = r
        print(f"| unseen-song note F1 @ onset {int(tol * 1000)} ms: "
              f"{r.f1:.3f} ({r.n_match}/{r.n_ref})")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--lay", type=int, default=2)
    parser.add_argument("--heads", type=int, default=2)
    parser.add_argument("--heads_dim", type=int, default=32)
    parser.add_argument("--kernel_size", type=int, default=15)
    parser.add_argument("--precision", choices=["32-true", "bf16"],
                        default="32-true")
    parser.add_argument("--prod", action="store_true",
                        help="production geometry shorthand: 8x512, 8 heads "
                             "x 64, k=31, bf16 (midi_conformer.yaml shape)")
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--task", choices=["continuous", "quant"],
                        default="continuous")
    parser.add_argument("--n_songs", type=int, default=12,
                        help="synthetic training songs (12 ~= 33 s audio)")
    parser.add_argument("--song_notes", type=int, default=9,
                        help="max notes per synthetic song")
    parser.add_argument("--eval_unseen", action="store_true",
                        help="after training, transcribe an UNSEEN synthetic "
                             "song through the real infer.py CLI and score "
                             "note F1 against its ground-truth labels")
    args = parser.parse_args()
    if args.prod:
        args.lay, args.dim, args.heads, args.heads_dim = 8, 512, 8, 64
        args.kernel_size, args.precision = 31, "bf16"

    base = pathlib.Path(args.workdir
                        or tempfile.mkdtemp(prefix=f"smoke_train_{args.task}_"))
    raw, binary, work = base / "raw", base / "binary", base / "work"
    rng = np.random.default_rng(2026)
    print(f"| workspace: {base}")
    if not (raw / "transcriptions.csv").exists():
        make_dataset(raw, rng, n_items=args.n_songs,
                     max_notes=args.song_notes)

    config = {
        "raw_data_dir": [str(raw)], "binary_data_dir": str(binary),
        "binarization_args": {"num_workers": 0, "shuffle": True,
                              "skip_glide": True, "merge_rest": True,
                              "merge_slur": True, "round_midi": False,
                              "slur_tolerance": 0.5},
        # class-path keys so the frozen work-dir config drives infer.py
        "task_cls": ("training.QuantizedMIDIExtractionTask"
                     if args.task == "quant"
                     else "training.MIDIExtractionTask"),
        "model_cls": "modules.model.Gmidi_conform.midi_conforms",
        "audio_sample_rate": SR, "hop_size": 512, "win_size": 2048,
        "fmin": 40, "fmax": 8000, "units_dim": 80, "units_encoder": "mel",
        "pe": "yin", "pe_ckpt": None,
        "key_shift_factor": 1, "key_shift_range": [-5, 5],
        "test_prefixes": ["song0"], "seed": 114514,
        "midi_min": 0, "midi_max": 127,
        "midi_num_bins": 129 if args.task == "quant" else 128,
        "midi_prob_deviation": 1.0, "rest_threshold": 0.1,
        "use_midi_loss": True, "use_bound_loss": True,
        "optimizer_args": {"optimizer_cls": "torch.optim.AdamW", "lr": 5e-4,
                           "beta1": 0.9, "beta2": 0.98, "weight_decay": 0},
        "lr_scheduler_args": {"scheduler_cls": "lr_scheduler.scheduler.WarmupLR",
                              "warmup_steps": 40, "min_lr": 1e-5},
        "clip_grad_norm": 1, "frame_bucket_grid": 64,
        "max_batch_frames": 8000, "max_batch_size": 8,
        "max_val_batch_frames": 4000, "max_val_batch_size": 1,
        "num_valid_plots": 0, "log_interval": 20, "num_sanity_val_steps": 0,
        "val_check_interval": max(args.steps // 2, 50),
        "num_ckpt_keep": 2, "max_updates": 100000,
        "permanent_ckpt_start": 0, "permanent_ckpt_interval": 0,
        "sampler_frame_count_grid": 6, "accumulate_grad_batches": 1,
        "sort_by_len": True,
        "pl_trainer_precision": args.precision,
        "midi_extractor_args": {
            "lay": args.lay, "dim": args.dim, "use_lay_skip": True,
            "kernel_size": args.kernel_size, "conv_drop": 0.1,
            "ffn_latent_drop": 0.1, "ffn_out_drop": 0.1,
            "attention_drop": 0.1, "attention_heads": args.heads,
            "attention_heads_dim": args.heads_dim},
    }

    if args.task == "quant":
        config["binarization_args"]["round_midi"] = True
        from some_tpu.preprocessing.me_quant_binarizer import (
            QuantizedMIDIExtractionBinarizer as Binarizer,
        )
        from some_tpu.training.me_quant_task import (
            QuantizedMIDIExtractionTask as Task,
        )
    else:
        from some_tpu.preprocessing.me_binarizer import (
            MIDIExtractionBinarizer as Binarizer,
        )
        from some_tpu.training.me_task import MIDIExtractionTask as Task
    if not (binary / "train.data").exists():
        Binarizer(dict(config)).process()

    import jax
    from some_tpu.parallel.mesh import make_mesh, shard_batch
    from some_tpu.training.trainer import Trainer

    task = Task(dict(config))
    trainer = Trainer(task, work, mesh=make_mesh(jax.devices()[:1]))
    state = trainer.fit(max_steps=args.steps)

    # final midi_acc on the validation item
    (valid_ds, valid_sizes) = task.load_datasets()[1]
    valid_step = task._valid_step
    batch = task.collate([valid_ds[0]])
    losses, extras = valid_step(state, shard_batch(batch, trainer.mesh))
    acc = int(extras["midi_acc_correct"]) / max(int(extras["midi_acc_total"]), 1)
    print(f"| after {int(state.step)} steps: val midi_acc = {acc:.3f} "
          f"(chance for a 24-semitone range ~= 0.04)")
    print(f"| losses: " + " ".join(f"{k}={float(v):.4f}" for k, v in losses.items()))
    if args.eval_unseen:
        eval_unseen(base, work, config)
    return 0 if acc > 0.3 else 1


if __name__ == "__main__":
    sys.exit(main())
