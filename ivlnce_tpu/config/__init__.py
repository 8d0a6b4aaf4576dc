from ivlnce_tpu.config.default import get_config
from ivlnce_tpu.config.node import CN, ConfigNode
from ivlnce_tpu.config.task_default import get_extended_config

__all__ = ["get_config", "get_extended_config", "ConfigNode", "CN"]
