"""Visualization-layer tests: sample plotter, crowd GIF tools, loss curves,
name helpers.  All tiny shapes so matplotlib stays fast."""

import os

import numpy as np
import pytest

from crowdmod_tpu.viz.plot_crowd import (
    Crowd,
    ddim_sort_key,
    draw_pred_vs_gt,
    make_short_name,
    max_rho,
    plot_losses,
    plot_people_density,
    render_pred_vs_gt_gif,
    render_sequence_gif,
)
from crowdmod_tpu.viz.plot_samples import (
    MacropropPlotter,
    frame_indexes,
    overlay_metrics,
    setup_predictions_plot,
)


@pytest.fixture
def viz_cfg(smoke_cfg):
    return smoke_cfg.updated({
        "MACROPROPS": {"ROWS": 8, "COLS": 12},
        "MODEL": {"NSAMPLES4PLOTS": 2},
    })


def _seqs(n=2, p=5, f=3, h=8, w=12, c=4, seed=0):
    rng = np.random.default_rng(seed)
    past = rng.uniform(0, 2, (n, p, h, w, c)).astype(np.float32)
    fut = rng.uniform(0, 2, (n, f, h, w, c)).astype(np.float32)
    pred = fut + rng.normal(0, 0.1, fut.shape).astype(np.float32)
    return past, fut, pred


def test_frame_indexes():
    assert frame_indexes(5, 3, "All") == [0, 1, 2, 3, 4, 5, 6, 7]
    assert frame_indexes(5, 3, "Last2") == [3, 4, 5, 6, 7]
    # Alternate keeps every other past frame but always the last one.
    assert frame_indexes(5, 3, "Alternate") == [0, 2, 4, 5, 6, 7]
    assert frame_indexes(4, 3, "Alternate") == [0, 3, 4, 5, 6]


def test_overlay_metrics_shapes(viz_cfg):
    past, fut, pred = _seqs()
    pred_seq = np.concatenate([past, pred], axis=1)
    gt_seq = np.concatenate([past, fut], axis=1)
    out = overlay_metrics(pred_seq, gt_seq, viz_cfg.METRICS,
                          viz_cfg.MACROPROPS.EPS)
    for name in ("psnr", "mpsnr", "ssim", "tv"):
        assert out[name].shape == (2, 8, 3)
    # Identical sequences → infinite-ish PSNR is avoided by eps clamp, but
    # SSIM must be exactly 1 and TV exactly 0.
    same = overlay_metrics(gt_seq, gt_seq, viz_cfg.METRICS,
                           viz_cfg.MACROPROPS.EPS)
    assert np.allclose(same["ssim"], 1.0, atol=1e-5)
    assert np.allclose(same["tv"], 0.0, atol=1e-6)


@pytest.mark.parametrize("plot_mprop", ["Density", "Density&Vel", "Uncertainty"])
def test_plot_static(viz_cfg, tmp_path, plot_mprop):
    past, fut, pred = _seqs()
    plotter = MacropropPlotter(viz_cfg, str(tmp_path), run_tag="T1")
    art = setup_predictions_plot(
        pred, past, fut, plotter, plot_type="Static",
        plot_mprop=plot_mprop, plot_past="Last2",
    )
    assert os.path.exists(art["static"])
    assert art["static"].endswith(".svg")
    assert len(art["density"]) == 2
    for p in art["density"]:
        assert os.path.exists(p)


def test_plot_dynamic_gifs(viz_cfg, tmp_path):
    past, fut, pred = _seqs(n=1)
    plotter = MacropropPlotter(viz_cfg, str(tmp_path), fps=4)
    art = setup_predictions_plot(
        pred, past, fut, plotter, plot_type="Dynamic",
    )
    # one pred GIF + one GT GIF for the single sequence
    assert len(art["gifs"]) == 2
    names = {os.path.basename(p) for p in art["gifs"]}
    assert names == {"mprops_seq_1.gif", "mprops_GT_seq_1.gif"}
    for p in art["gifs"]:
        assert os.path.getsize(p) > 0


def test_crowd_container_and_gifs(tmp_path):
    rng = np.random.default_rng(0)
    seq = rng.uniform(0, 3, (4, 8, 12, 4)).astype(np.float32)
    c = Crowd.from_frame(seq[0])
    assert c.rho.shape == (8, 12)
    assert c.mu_v.shape == (8, 12, 2)
    assert max_rho(seq) == pytest.approx(float(seq[..., 0].max()))

    p1 = render_sequence_gif(seq, str(tmp_path / "seq.gif"), fps=4)
    assert os.path.getsize(p1) > 0
    p2 = render_pred_vs_gt_gif(seq, seq, str(tmp_path / "cmp.gif"), fps=4)
    assert os.path.getsize(p2) > 0
    p3 = draw_pred_vs_gt(seq[0], seq[1], "t=0", 3.0,
                         save_path=str(tmp_path / "pair.png"))
    assert os.path.getsize(p3) > 0


def test_loss_and_density_plots(tmp_path):
    p = plot_losses([1.0, 0.5, 0.3], [1.1, None, 0.4], "unit",
                    str(tmp_path / "loss.png"))
    assert os.path.getsize(p) > 0
    p2 = plot_people_density(
        np.random.rand(50) * 12, np.random.rand(50) * 8, (0.0, 8.0),
        "density", save_path=str(tmp_path / "dens.png"),
        grid_hw=(8, 12),
    )
    assert os.path.getsize(p2) > 0


def test_boxplot_huge_range_does_not_tick_explode(tmp_path):
    """Round-5 regression: eps-regularized metrics (RE_DENSITY on empty GT
    cells) reach 1e6+; a fixed ytick_step then asked matplotlib for
    millions of tick artists — effectively a hang.  Past 200 ticks the
    auto-locator takes over; the plot must render in bounded time."""
    import time

    from crowdmod_tpu.viz.plot_metrics import boxplot

    data = {"re": np.array([0.1, 2.0, 1.5e6, 3.0e6]),
            "inf": np.array([np.inf, 1.0, 2.0])}
    t0 = time.time()
    boxplot(data, "huge-range", str(tmp_path / "bp.png"), ytick_step=2)
    assert time.time() - t0 < 30
    assert os.path.getsize(tmp_path / "bp.png") > 0


def test_name_helpers():
    assert make_short_name("DDPM-UNet_ATC_TE200_DDIM_10") == "DDPM-UNet-DDIM10"
    assert make_short_name("DDPM-UNet_ATC_TE200") == "DDPM-UNet"
    names = ["m_DDIM_100", "m_DDIM_2", "m_plain"]
    assert sorted(names, key=ddim_sort_key) == ["m_plain", "m_DDIM_2", "m_DDIM_100"]
