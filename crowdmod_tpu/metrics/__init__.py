from crowdmod_tpu.metrics import functional
from crowdmod_tpu.metrics.generator import MetricsEngine, compute_metrics

__all__ = ["functional", "MetricsEngine", "compute_metrics"]
