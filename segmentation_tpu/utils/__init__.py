from segmentation_tpu.utils import checkpoint, profiling, summary
from segmentation_tpu.utils.profiling import StepTimer, benchmark_fn, trace
from segmentation_tpu.utils.summary import SummaryWriter

__all__ = [
    "checkpoint",
    "profiling",
    "summary",
    "StepTimer",
    "benchmark_fn",
    "trace",
    "SummaryWriter",
]
