from crowdmod_tpu.data.windows import WindowDataset, window_indices
from crowdmod_tpu.data.synthetic import synthetic_walkers

__all__ = ["WindowDataset", "window_indices", "synthetic_walkers"]
