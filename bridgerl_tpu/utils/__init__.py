from .compilation_cache import apply_platform_override, enable_compilation_cache
from .logging import TermColor, Throughput, epoch_log, fmt_eta
from .profiling import StepTimer, trace
