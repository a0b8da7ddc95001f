"""Strip a checkpoint to inference-only weights
(reference counterpart: simplify.py:7-21; also converts torch ckpts)."""
import click


@click.command(help="Simplify a checkpoint, dropping all keys useless for inference.")
@click.argument("input_ckpt", metavar="INPUT_CKPT")
@click.argument("output_ckpt", metavar="OUTPUT_CKPT")
def simplify(input_ckpt, output_ckpt):
    from some_tpu.training.checkpoint import simplify_checkpoint
    simplify_checkpoint(input_ckpt, output_ckpt)
    print(f"| saved simplified checkpoint to '{output_ckpt}'")


if __name__ == "__main__":
    simplify()
