"""Nightly protocol-quality gate (VERDICT round-3 item 4).

Runs the reference evaluation protocol (``tools/eval_protocol_full.py`` —
reference generate_metrics.py:53-58 repeated-past chunk protocol, metric
ALL) at a REDUCED but FIXED scale sized for the 1-CPU nightly tier, then
asserts explicit per-sampler thresholds: PSNR floors, an ENERGY ceiling,
the stochastic-vs-deterministic ordering that the round-4 study
established at full scale (VALIDATION.md), and a wall-time budget.  A
deliberate ~3 dB quality regression in the trainer, schedule, v-param
head, EMA, or any sampler trips a failure here instead of drifting.

Reduced gate scale (fixed — thresholds are calibrated to it):
  T=100, 25 train epochs, PRED_TYPE v, EMA 0.999, 3x24-seq corpus,
  batch 16 x chunk 4 = 64 protocol samples, seed 42.
Calibration run (2026-08-20, /tmp/nightly_calib, v5e backend; the gate
itself runs on the CPU tier where numbers track within margin): ancestral
PSNR 11.06 / ENERGY 0.28; DDIM-eta(1.0,10) PSNR 11.51 / ENERGY 0.24;
DDIM-eta(0.0,10) PSNR 8.41 / ENERGY 0.68.  Floors sit ~3 dB under the
calibrated values so seed/backend/XLA-version jitter does not flake the
gate while a deliberate ~3 dB regression still trips it.
"""

from __future__ import annotations

import json
import os

import pytest

pytestmark = pytest.mark.nightly

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ANCESTRAL = "DDPM"
FAST_STOCH = "DDIM-eta:1.0:10"
FAST_DET = "DDIM-eta:0.0:10"

@pytest.fixture(scope="module")
def protocol_report(tmp_path_factory):
    from tools.eval_protocol_full import main as eval_main

    out = tmp_path_factory.mktemp("protocol_gate")
    rc = eval_main([
        "--out", str(out),
        "--timesteps", "100",
        "--train-epochs", "25",
        "--pred-type", "v",
        "--ema-decay", "0.999",
        "--files", "3", "--per-file", "24",
        "--batch-size", "16", "--chunk", "4",
        "--seed", "42",
        "--samplers", ANCESTRAL, FAST_STOCH, FAST_DET,
    ])
    assert rc == 0
    with open(os.path.join(str(out), "report.json")) as f:
        return json.load(f)


def _mean(report, sampler, metric):
    means = report["samplers"][sampler]["metric_means"]
    assert metric in means, f"{sampler} produced no {metric} array"
    return means[metric]


def test_protocol_shape(protocol_report):
    """The gate runs the real chunked protocol, not a smoke."""
    assert protocol_report["protocol"]["nsamples"] == 64
    assert protocol_report["protocol"]["chunk"] == 4
    for s in (ANCESTRAL, FAST_STOCH, FAST_DET):
        # All 20 metric arrays incl. the MAX/MIN chunk statistics.
        assert len(protocol_report["samplers"][s]["metric_means"]) >= 18


def test_ancestral_psnr_floor(protocol_report):
    """Training-side regressions (schedule, v-param, EMA, trainer) surface
    here: the T=100 ancestral chain must clear the calibrated floor
    (11.06 calibrated; 3 dB margin)."""
    assert _mean(protocol_report, ANCESTRAL, "PSNR") > 8.0


def test_fast_sampler_psnr_floor(protocol_report):
    """The serving fast path (stochastic eta-DDIM, 10 of 100 steps) must
    stay within 2 dB of ancestral — the round-4 headline property."""
    fast = _mean(protocol_report, FAST_STOCH, "PSNR")
    ancestral = _mean(protocol_report, ANCESTRAL, "PSNR")
    assert fast > 8.0  # 11.51 calibrated
    assert fast > ancestral - 2.0  # calibrated: fast sits 0.45 dB ABOVE


def test_stochastic_beats_deterministic(protocol_report):
    """The eta ablation ordering from the full-scale study: per-step noise
    injection (eta=1) must beat the deterministic grid (eta=0) at the
    identical teacher/step grid."""
    assert (_mean(protocol_report, FAST_STOCH, "PSNR")
            > _mean(protocol_report, FAST_DET, "PSNR"))


def test_energy_ceiling(protocol_report):
    """ENERGY is |GT - PRED| total-mass error (reference
    metricsGenerator.py compute_energy): a mode-collapse/mass-blowup
    regression raises it even when PSNR floors still pass."""
    assert _mean(protocol_report, ANCESTRAL, "ENERGY") < 0.50
    assert _mean(protocol_report, FAST_STOCH, "ENERGY") < 0.50


def test_wall_time_budget(protocol_report):
    """Per-sampler protocol wall budget on the 1-CPU nightly host; a
    chain-dispatch regression (e.g. per-step recompiles) blows this long
    before it doubles total suite time."""
    for s in (FAST_STOCH, FAST_DET):
        assert protocol_report["samplers"][s]["wall_s"] < 600.0
    assert protocol_report["samplers"][ANCESTRAL]["wall_s"] < 1800.0
