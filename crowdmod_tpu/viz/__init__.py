"""Visualization: sample plots/GIFs, crowd rendering, metric boxplots,
comparison tooling (reference utils/plot/* and utils/crowd.py)."""
