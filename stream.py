"""Live transcription CLI: raw PCM on stdin -> NDJSON note events on stdout.

The streaming front-end for the TPU engine (some_tpu/inference/streaming.py)
as a unix pipeline stage — a capability the reference does not have (its
pipeline is file-at-a-time, reference: infer.py:33-47). Example:

    ffmpeg -i mic.wav -f s16le -ac 1 -ar 44100 - | \
        python stream.py --model experiments/model.ckpt

Each completed phrase prints one JSON line the moment the silence scan
decides the phrase is over:

    {"offset_sec": 12.48, "note_midi": [...], "note_dur_sec": [...],
     "note_rest": [...]}

With --midi PATH, the accumulated song is also written as an SMF file at
end-of-stream.
"""
from __future__ import annotations

import json
import pathlib
import sys

import click
import numpy as np


def _event_line(event) -> str:
    from some_tpu.inference.pipeline import segment_to_json

    return json.dumps(segment_to_json(event["offset"], event["segment"]))


@click.command(help="Stream raw mono PCM from stdin; print note events as "
                    "NDJSON the moment each phrase completes.")
@click.option("--model", required=True,
              type=click.Path(exists=True, dir_okay=False),
              help="Path to the checkpoint (config.yaml alongside).")
@click.option("--pcm-format", type=click.Choice(["s16le", "f32le"]),
              default="s16le", show_default=True,
              help="Wire format of the stdin samples (mono, at the model's "
                   "sample rate).")
@click.option("--chunk-ms", type=float, default=100.0, show_default=True,
              help="How much audio to read per iteration.")
@click.option("--midi", required=False, metavar="MIDI_PATH",
              help="Also write the accumulated SMF here at end-of-stream.")
@click.option("--tempo", required=False, type=float, default=120)
@click.option("--prewarm/--no-prewarm", default=True, show_default=True,
              help="Compile every (frame-bucket x 1-2 rows) program before "
                   "reading stdin. Without it a live caller pays each "
                   "first-visit compile ON the real-time path (measured "
                   "32.8 s worst-case first-event latency, BENCH_NOTES "
                   "round-4 streaming; prewarmed steady state is <1 s).")
@click.option("--prewarm-buckets", required=False, default=None,
              metavar="T1,T2,..",
              help="Prewarm ONLY these frame buckets (like serve.py "
                   "--prewarm). Default: every bucket <=4096 frames — "
                   "thorough but slow to start where executable loads are "
                   "expensive (22 programs took 562 s on the tunneled dev "
                   "chip, BENCH_NOTES round 5); a deployment that knows its "
                   "phrase lengths can start in a fraction of that. "
                   "Off-list buckets compile on first visit.")
def stream(model, pcm_format, chunk_ms, midi, tempo, prewarm,
           prewarm_buckets):
    import yaml

    from some_tpu.inference.base_infer import build_inference
    from some_tpu.inference.streaming import StreamingTranscriber

    model_path = pathlib.Path(model)
    with open(model_path.with_name("config.yaml"), "r", encoding="utf8") as f:
        config = yaml.safe_load(f)
    engine = build_inference(config, model_path)

    sr = config["audio_sample_rate"]
    itemsize = 2 if pcm_format == "s16le" else 4
    chunk_bytes = max(itemsize, int(sr * chunk_ms / 1000) * itemsize)

    # Drain stdin from a background thread STARTED BEFORE the prewarm: a
    # plain-pipe caller (the docstring's ffmpeg example) has no way to wait
    # for the ready marker, and a blocked pipe would stall/drop the source
    # for the whole warmup (code-review r5). Audio buffers in memory
    # meanwhile — mono PCM is ~5 MB/min at 44.1 kHz s16, so even a
    # multi-minute warmup holds tens of MB, not GB.
    import queue as _queue
    chunks_q: "_queue.Queue[bytes]" = _queue.Queue()

    def _drain_stdin():
        stdin = sys.stdin.buffer
        while True:
            data = stdin.read(chunk_bytes)
            chunks_q.put(data)
            if not data:  # EOF sentinel stays in the queue
                return

    import threading
    threading.Thread(target=_drain_stdin, daemon=True).start()

    if prewarm:
        # rows (1, 2): the live path feeds one phrase at a time (row 1);
        # an over-length phrase seam-splits into multiple rows, which
        # row-bucketing rounds to 2+ (row 2 covers the common case without
        # tripling warmup cost). Buckets above 4096 frames (~47 s of
        # silence-free singing) are left to compile on demand — phrases
        # that long don't occur in live vocal input.
        if prewarm_buckets:
            buckets = [int(b) for b in prewarm_buckets.split(",")
                       if b.strip()]
        else:
            buckets = [b for b in engine.frame_buckets if b <= 4096]
        print("| prewarming bucket programs before accepting audio...",
              file=sys.stderr, flush=True)
        n = engine.prewarm(buckets, rows=(1, 2))
        print(f"| prewarmed {n} bucket programs", file=sys.stderr, flush=True)
    st = StreamingTranscriber(engine)
    # machine-readable readiness marker: harnesses (bench_stream_live) and
    # mic pipelines can wait for this before opening the audio source, so
    # no live audio races the warmup above
    print("| ready (awaiting stdin)", file=sys.stderr, flush=True)

    pending = b""
    while True:
        data = chunks_q.get()
        if not data:
            break
        pending += data
        usable = len(pending) - len(pending) % itemsize
        if not usable:
            continue
        raw, pending = pending[:usable], pending[usable:]
        if pcm_format == "s16le":
            pcm = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        else:
            pcm = np.frombuffer(raw, "<f4").astype(np.float32)
        for event in st.feed(pcm):
            print(_event_line(event), flush=True)
    for event in st.flush():
        print(_event_line(event), flush=True)

    if midi is not None:
        st.to_midi(tempo=tempo).save(midi)
        print(f"MIDI file saved at: '{midi}'", file=sys.stderr)


if __name__ == "__main__":
    stream()
