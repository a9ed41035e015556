from .compilation_cache import enable_persistent_cache
from .profiling import Throughput, trace

__all__ = ["trace", "Throughput", "enable_persistent_cache"]
