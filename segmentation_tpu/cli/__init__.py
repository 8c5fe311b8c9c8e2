from segmentation_tpu.cli.main import build_trainer, main

__all__ = ["build_trainer", "main"]
