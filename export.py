"""Export CLI: checkpoint -> serialized StableHLO deployment artifact
(reference counterpart: export.py:52-106; ONNX becomes StableHLO — see
some_tpu/deployment/export.py docstring for the shape policy)."""
import pathlib

import click


@click.command(help="Export a trained model as a StableHLO deployment artifact")
@click.option("--model", required=True, metavar="CKPT_PATH",
              help="Path to the model checkpoint (*.ckpt)")
@click.option("--out", required=False, metavar="OUT_DIR",
              help="Output artifact directory (default: <ckpt>.stablehlo/)")
@click.option("--buckets", default="256,512,1024,2048,4096",
              help="Comma-separated frame buckets to export")
@click.option("--platforms", default="tpu,cpu",
              help="Comma-separated lowering platforms")
def export(model, out, buckets, platforms):
    import yaml

    from some_tpu.config import print_config
    from some_tpu.deployment.export import DeploymentExporter
    from some_tpu.registry import TASK_DEPLOYMENT_MAPPING, resolve_class

    model_path = pathlib.Path(model)
    with open(model_path.with_name("config.yaml"), "r", encoding="utf8") as f:
        config = yaml.safe_load(f)
    print_config(config)
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
