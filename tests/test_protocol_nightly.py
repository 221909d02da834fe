"""Nightly protocol-quality gate (VERDICT round-3 item 4; floors
re-calibrated round 5, VERDICT round-4 item 3).

Runs the reference evaluation protocol (``tools/eval_protocol_full.py`` —
reference generate_metrics.py:53-58 repeated-past chunk protocol, metric
ALL) at a REDUCED but FIXED scale sized for the 1-CPU nightly tier, then
asserts per-sampler thresholds derived from a measured N=5 seed-variance
study — floors sit at ``mean − (2 dB + σ)``, so a deliberate ~3 dB
regression trips while seed jitter (σ ≈ 0.5 dB) does not.

Reduced gate scale (fixed — thresholds are calibrated to it):
  T=100, 25 train epochs, PRED_TYPE v, EMA 0.999, 3x24-seq corpus,
  batch 16 x chunk 4 = 64 protocol samples.

CPU-tier calibration (tools/protocol_variance.py, 5 seeds 42-46,
2026-08-21, /tmp/proto_var/summary.json — ADVICE r4: the gate runs on the
CPU tier, so the floors are derived from CPU numbers, not v5e's):

  | sampler                    | PSNR mean±σ   | SSIM        | ENERGY      |
  |----------------------------|---------------|-------------|-------------|
  | DDPM ancestral T=100       | 11.08 ± 0.50  | 0.006±0.001 | 0.250±0.014 |
  | DDIM-eta 1.0@10 (fast)     | 11.45 ± 0.52  | 0.007±0.001 | 0.225±0.014 |
  | DDIM-eta 0.0@10 (ablation) |  8.12 ± 0.49  | 0.002±0.000 | 0.651±0.025 |
  | fast + Sparsity λ=0.4      | 11.88 ± 0.53  | 0.008±0.001 | 0.123±0.009 |

Regression sensitivity, demonstrated (VALIDATION.md round 5): a
regression that silently disables the fast path's per-step noise
injection (η=0 — the exact stochastic mechanism the serving default
depends on) scores 8.12 ± 0.49, below the 8.9 fast floor on EVERY seed
(max 8.76).  The EMA-ablation lever suggested in the round-4 verdict
does NOT regress at this scale — raw weights score +3.1 dB ABOVE EMA at
25 epochs because the average lags while undertrained (recorded in the
same study; at the 200-epoch full protocol EMA is part of the winning
recipe) — so the gate's sensitivity witness is the η ablation, which the
suite runs every night as FAST_DET.
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
GUIDED = "DDIM-eta:1.0:10+Sparsity:0.4"

# mean − (2 dB + σ) from the calibration table above.
PSNR_FLOORS = {
    ANCESTRAL: 8.6,
    FAST_STOCH: 8.9,
    FAST_DET: 5.6,
    GUIDED: 9.3,
}


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
        "--samplers", ANCESTRAL, FAST_STOCH, FAST_DET, GUIDED,
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
    for s in (ANCESTRAL, FAST_STOCH, FAST_DET, GUIDED):
        # All 20 metric arrays incl. the MAX/MIN chunk statistics.
        assert len(protocol_report["samplers"][s]["metric_means"]) >= 18


def test_ancestral_psnr_floor(protocol_report):
    """Training-side regressions (schedule, v-param, trainer) surface here:
    the T=100 ancestral chain must clear mean − (2 + σ) = 8.6."""
    assert _mean(protocol_report, ANCESTRAL, "PSNR") > PSNR_FLOORS[ANCESTRAL]


def test_fast_sampler_psnr_floor(protocol_report):
    """The serving fast path (stochastic eta-DDIM, 10 of 100 steps) must
    clear its calibrated floor AND stay within 2 dB of ancestral (measured:
    it sits 0.37 dB ABOVE).  Sensitivity witness: the η=0 ablation scores
    8.12 — below this floor on every calibration seed."""
    fast = _mean(protocol_report, FAST_STOCH, "PSNR")
    ancestral = _mean(protocol_report, ANCESTRAL, "PSNR")
    assert fast > PSNR_FLOORS[FAST_STOCH]
    assert fast > ancestral - 2.0


def test_stochastic_beats_deterministic(protocol_report):
    """The eta ablation ordering from the full-scale study: per-step noise
    injection (eta=1) must beat the deterministic grid (eta=0) at the
    identical teacher/step grid (measured gap: 3.3 dB)."""
    assert (_mean(protocol_report, FAST_STOCH, "PSNR")
            > _mean(protocol_report, FAST_DET, "PSNR"))


def test_guided_default_quality(protocol_report):
    """The shipped serving combination (fast path + Sparsity guidance,
    round-5 λ sweep): guidance must not hurt PSNR (measured: +0.43 dB),
    must clear its own floor, and must clear the serving default's SSIM
    floor (mean − 2σ·2 ≈ 0.004)."""
    guided = _mean(protocol_report, GUIDED, "PSNR")
    unguided = _mean(protocol_report, FAST_STOCH, "PSNR")
    assert guided > PSNR_FLOORS[GUIDED]
    assert guided > unguided - 0.5
    assert _mean(protocol_report, GUIDED, "SSIM") > 0.004


def test_energy_ceilings(protocol_report):
    """ENERGY is |GT − PRED| total-mass error (reference
    metricsGenerator.py compute_energy).  Ceilings at mean + (2σ + 50%
    headroom) from the calibration: a mass blowup trips even when PSNR
    floors still pass.  Guidance must also deliver its measured mass
    improvement (calibrated 0.123 vs 0.225 unguided)."""
    assert _mean(protocol_report, ANCESTRAL, "ENERGY") < 0.35
    assert _mean(protocol_report, FAST_STOCH, "ENERGY") < 0.32
    assert _mean(protocol_report, GUIDED, "ENERGY") < 0.20


def test_wall_time_budget(protocol_report):
    """Per-sampler protocol wall budget on the 1-CPU nightly host; a
    chain-dispatch regression (e.g. per-step recompiles) blows this long
    before it doubles total suite time."""
    for s in (FAST_STOCH, FAST_DET, GUIDED):
        assert protocol_report["samplers"][s]["wall_s"] < 600.0
    assert protocol_report["samplers"][ANCESTRAL]["wall_s"] < 1800.0
