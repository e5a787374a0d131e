from pemp_tpu.utils.loggers import get_global_logger, C
from pemp_tpu.utils.timer import Timer
from pemp_tpu.utils.misc import set_seed, find_snapshot

__all__ = ["get_global_logger", "C", "Timer", "set_seed", "find_snapshot"]
