"""Shared utilities: compile cache, benchmarking, meters, profiling."""

from .benchmark import timed_loop
from .cache import enable_compilation_cache
from .embedding import gaussian_mmd, tsne
from .meters import AverageMeter, CsvLogger, TermLogger, make_summary_writer
from .profiling import StepTimer, profile_trace, seed_everything
from .viz import tensor2array, transpose_image

__all__ = [
    "AverageMeter",
    "CsvLogger",
    "StepTimer",
    "TermLogger",
    "enable_compilation_cache",
    "gaussian_mmd",
    "make_summary_writer",
    "profile_trace",
    "seed_everything",
    "tensor2array",
    "timed_loop",
    "transpose_image",
    "tsne",
]
