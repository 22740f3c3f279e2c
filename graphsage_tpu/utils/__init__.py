from graphsage_tpu.utils.config import Config, parse_hocon, load_config

__all__ = ["Config", "parse_hocon", "load_config"]
