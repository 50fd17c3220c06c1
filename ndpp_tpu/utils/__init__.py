from ndpp_tpu.utils.errors import AceFormatError, ConfigError, NdppError
from ndpp_tpu.utils.timer import PhaseTimers

__all__ = ["NdppError", "AceFormatError", "ConfigError", "PhaseTimers"]
