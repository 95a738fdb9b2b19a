"""Cross-cutting utilities: stage profiling / observability."""

from bp_from_video_tpu.utils.profiling import StageProfiler, profiler, printit, timeit

__all__ = ["StageProfiler", "profiler", "printit", "timeit"]
