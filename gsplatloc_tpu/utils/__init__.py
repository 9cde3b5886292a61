from .checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .profiling import profile_trace, time_block  # noqa: F401
