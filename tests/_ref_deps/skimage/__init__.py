"""skimage shim package: only `skimage.metrics.structural_similarity`."""
