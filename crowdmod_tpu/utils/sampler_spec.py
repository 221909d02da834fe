"""Inline sampler-spec parsing shared by the tool surfaces.

Several drivers (``tools/eval_protocol_full.py``, ``tools/soak_http.py``,
``tools/bench_serving.py``) accept a sampler on the command line either as a
plain ``MODEL.DDPM.SAMPLER`` name (``DDPM``, ``DDIM``, ``DPM-Solver``,
``Distilled``…) or as the inline stochastic-DDIM form
``DDIM-eta:ETA:STEPS`` (e.g. ``DDIM-eta:1.0:25``, the quality-pinned
serving default — ``configs/serving/``).  One parser here so the three
surfaces cannot drift.
"""

from __future__ import annotations


def sampler_overrides(spec: str) -> dict:
    """``spec`` → the ``MODEL.DDPM`` config-override dict selecting it.

    >>> sampler_overrides("DPM-Solver")
    {'SAMPLER': 'DPM-Solver'}
    >>> sampler_overrides("DDIM-eta:1.0:25")
    {'SAMPLER': 'DDIM-eta', 'ETA': 1.0, 'ETA_STEPS': 25}
    """
    if spec.startswith("DDIM-eta:"):
        parts = spec.split(":")
        if len(parts) != 3:
            raise ValueError(
                f"bad sampler spec {spec!r}: the inline form is "
                "'DDIM-eta:ETA:STEPS', e.g. 'DDIM-eta:1.0:25'"
            )
        _, eta_s, steps_s = parts
        try:
            return {"SAMPLER": "DDIM-eta", "ETA": float(eta_s),
                    "ETA_STEPS": int(steps_s)}
        except ValueError:
            raise ValueError(
                f"bad sampler spec {spec!r}: ETA must be a float and STEPS "
                "an int ('DDIM-eta:1.0:25')"
            ) from None
    return {"SAMPLER": spec}
