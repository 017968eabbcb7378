"""``python -m raglite_tpu`` entry point."""

from raglite_tpu.cli import cli

if __name__ == "__main__":
    cli()
