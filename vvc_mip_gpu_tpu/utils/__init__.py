"""Configuration, timing/tracing, and misc utilities."""

from vvc_mip_gpu_tpu.utils.config import EngineConfig
from vvc_mip_gpu_tpu.utils.timing import StageTimer, print_timestamp

__all__ = ["EngineConfig", "StageTimer", "print_timestamp"]
