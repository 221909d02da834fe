from crowdmod_tpu.config.frozen import FrozenConfig
from crowdmod_tpu.config.loader import load_config, config_dir

__all__ = ["FrozenConfig", "load_config", "config_dir"]
