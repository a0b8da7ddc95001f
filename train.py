"""Training CLI: config cascade -> task -> mesh trainer with auto-resume.

API-compatible with the reference entrypoint (reference: train.py:27-98):
same flags, same work-dir layout (frozen config.yaml + step-named ckpts +
TensorBoard event files), same auto-resume-from-latest semantics.
"""
import logging
import pathlib
import sys

import click

logging.basicConfig(stream=sys.stdout, level=logging.INFO,
                    format="%(asctime)s %(message)s", datefmt="%m/%d %I:%M:%S %p")


@click.command(help="Train a SOME-TPU model")
@click.option("--config", required=True, metavar="FILE",
              help="Path to the configuration file")
@click.option("--exp_name", required=True, metavar="EXP", help="Experiment name")
@click.option("--work_dir", required=False, metavar="DIR",
              help="Directory to save the experiment")
@click.option("--max_steps", required=False, type=int, default=None,
              help="Override max_updates (smoke runs)")
def train(config, exp_name, work_dir, max_steps):
    from some_tpu.config import dump_config, print_config, read_full_config
    from some_tpu.parallel.distributed import maybe_initialize
    from some_tpu.registry import build_object
    from some_tpu.training.base_task import BaseTask
    from some_tpu.training.trainer import Trainer

    # join the multi-host runtime first (no-op unless SOME_TPU_COORDINATOR /
    # SOME_TPU_MULTIHOST=auto is set) — must precede any backend use
    maybe_initialize()
    import jax
    is_rank0 = jax.process_index() == 0

    config = read_full_config(pathlib.Path(config))
    if is_rank0:
        print_config(config)
    if work_dir is None:
        work_dir = pathlib.Path(__file__).parent / "experiments"
    else:
        work_dir = pathlib.Path(work_dir)
    work_dir = work_dir / exp_name
    assert not work_dir.exists() or work_dir.is_dir(), \
        f"Path '{work_dir}' is not a directory."
    work_dir.mkdir(parents=True, exist_ok=True)
    if is_rank0:
        dump_config(config, work_dir / "config.yaml")
    config["work_dir"] = str(work_dir)

    task = build_object(config["task_cls"], BaseTask, config=config)

    log_writer = None
    if is_rank0:
        try:
            from tensorboardX import SummaryWriter
            log_writer = SummaryWriter(
                logdir=str(work_dir / "lightning_logs" / "lastest"))  # [sic] ref name
        except ImportError:
            pass

    trainer = Trainer(task, work_dir, log_writer=log_writer)
    trainer.fit(max_steps=max_steps)


if __name__ == "__main__":
    train()
