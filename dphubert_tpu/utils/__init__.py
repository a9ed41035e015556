from .profiling import Throughput, trace

__all__ = ["trace", "Throughput"]
