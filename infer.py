"""Single-WAV inference CLI: waveform -> silence slicing -> TPU pipeline -> MIDI.

API-compatible with the reference CLI (reference: infer.py:14-47). The model
checkpoint may be a native SOME-TPU ckpt or a published torch .ckpt (it is
converted on the fly).
"""
import pathlib

import click
import yaml


@click.command(help="Run inference with a trained model")
@click.option("--model", required=True, metavar="CKPT_PATH",
              help="Path to the model checkpoint (*.ckpt)")
@click.option("--wav", required=True, metavar="WAV_PATH",
              help="Path to the input wav file (*.wav)")
@click.option("--midi", required=False, metavar="MIDI_PATH",
              help="Path to the output MIDI file (*.mid)")
@click.option("--tempo", required=False, type=float, default=120,
              metavar="TEMPO", help="Tempo of the output MIDI")
@click.option("--quantize", required=False, type=click.Choice(["none", "int8"]),
              default=None, help="Serving quantization: int8 halves resident "
              "weight bytes (~0.4%% matmul noise); measured speed-neutral on "
              "this chip — see BENCH_NOTES.md")
@click.option("--devices", required=False, type=int, default=1,
              help="Data-parallel serving over N local devices (bucket "
              "batches shard over a mesh; 1 = single device)")
@click.option("--wire-sr", required=False, type=int, default=None,
              help="Decimate the host->device audio wire to this rate "
              "(e.g. 22050): equivalent STFT analysis when fmax fits, half "
              "the wire bytes and mel FLOPs — see ARCHITECTURE.md")
def infer(model, wav, midi, tempo, quantize, devices, wire_sr):
    from some_tpu.audio.wavio import load_wav
    from some_tpu.config import print_config
    from some_tpu.inference.base_infer import build_inference
    from some_tpu.inference.pipeline import transcribe_waveform

    model_path = pathlib.Path(model)
    with open(model_path.with_name("config.yaml"), "r", encoding="utf8") as f:
        config = yaml.safe_load(f)
    if quantize is not None:
        config["quantize"] = quantize
    if wire_sr is not None:
        config["wire_sr"] = wire_sr
    print_config(config)
    kwargs = {}
    if devices > 1:
        import jax

        from some_tpu.parallel.mesh import make_mesh
        kwargs["mesh"] = make_mesh(jax.devices()[:devices])
    engine = build_inference(config, model_path, **kwargs)

    wav_path = pathlib.Path(wav)
    waveform, _ = load_wav(wav_path, sr=config["audio_sample_rate"], mono=True)
    midi_file = transcribe_waveform(engine, waveform,
                                    config["audio_sample_rate"], tempo=tempo)
    midi_path = pathlib.Path(midi) if midi is not None else wav_path.with_suffix(".mid")
    midi_file.save(midi_path)
    print(f"MIDI file saved at: '{midi_path}'")


if __name__ == "__main__":
    infer()
