"""Export CLI: checkpoint -> deployment artifact.

Two formats (reference counterpart: export.py:52-106):
  * stablehlo (default) — the TPU-first serving artifact: per-bucket
    StableHLO programs + manifest (some_tpu/deployment/export.py).
  * onnx — ecosystem-parity bridge for downstream DiffSinger tools: the
    reference's opset-17 waveform->notes graph, produced through the
    first-party torch model (some_tpu/deployment/onnx_export.py).
"""
import pathlib

import click


@click.command(help="Export a trained model as a deployment artifact")
@click.option("--model", required=True, metavar="CKPT_PATH",
              help="Path to the model checkpoint (*.ckpt)")
@click.option("--out", required=False, metavar="OUT_PATH",
              help="Output path (default: <ckpt>.stablehlo/ or <ckpt>.onnx)")
@click.option("--format", "fmt", default="stablehlo",
              type=click.Choice(["stablehlo", "onnx"]),
              help="Artifact format")
@click.option("--buckets", default="256,512,1024,2048,4096",
              help="Comma-separated frame buckets to export (stablehlo)")
@click.option("--platforms", default="tpu,cpu",
              help="Comma-separated lowering platforms (stablehlo)")
def export(model, out, fmt, buckets, platforms):
    import yaml

    from some_tpu.config import print_config

    model_path = pathlib.Path(model)
    with open(model_path.with_name("config.yaml"), "r", encoding="utf8") as f:
        config = yaml.safe_load(f)
    print_config(config)

    if fmt == "onnx":
        from some_tpu.deployment.onnx_export import export_onnx
        from some_tpu.training.checkpoint import load_any_checkpoint

        ckpt = load_any_checkpoint(model_path)
        variables = {"params": ckpt["params"]}
        if ckpt.get("batch_stats"):
            variables["batch_stats"] = ckpt["batch_stats"]
        out_path = pathlib.Path(out) if out else model_path.with_suffix(".onnx")
        export_onnx(config, variables, out_path)
        print(f"ONNX model saved at: '{out_path}'")
        return

    from some_tpu.deployment.export import DeploymentExporter
    from some_tpu.registry import TASK_DEPLOYMENT_MAPPING, resolve_class

    exporter_path = TASK_DEPLOYMENT_MAPPING.get(config["task_cls"])
    if exporter_path is None:
        raise KeyError(f"no exporter registered for task {config['task_cls']!r}")
    exporter_cls = resolve_class(exporter_path)
    assert issubclass(exporter_cls, DeploymentExporter)
    exporter = exporter_cls(config=config, model_path=model_path)
    out_dir = pathlib.Path(out) if out else model_path.with_suffix(".stablehlo")
    exporter.export(out_dir,
                    buckets=[int(b) for b in buckets.split(",")],
                    platforms=[p.strip() for p in platforms.split(",")])
    print(f"StableHLO artifact saved at: '{out_dir}'")


if __name__ == "__main__":
    export()
