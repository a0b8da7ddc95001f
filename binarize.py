"""Binarization CLI: raw DiffSinger dataset -> indexed binary dataset
(reference counterpart: binarize.py:10-27)."""
import pathlib

import click


@click.command(help="Process the raw dataset into a binary dataset")
@click.option("--config", required=True, metavar="FILE",
              help="Path to the configuration file")
def binarize(config):
    from some_tpu.config import print_config, read_full_config
    from some_tpu.preprocessing.base_binarizer import BaseBinarizer
    from some_tpu.registry import build_object

    config = read_full_config(pathlib.Path(config))
    print_config(config)
    binarizer = build_object(config["binarizer_cls"], BaseBinarizer, config=config)
    print("| Binarizer: ", type(binarizer))
    binarizer.process()


if __name__ == "__main__":
    binarize()
