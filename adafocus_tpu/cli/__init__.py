"""Command-line entry points (the reference's hydra apps re-done as plain
argparse + typed configs): ``python -m adafocus_tpu.cli.train`` and
``python -m adafocus_tpu.cli.evaluate``."""
