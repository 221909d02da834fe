"""Comparison tooling tests: cross-model metric figures + HTML GIF viewer."""

import json
import os

import numpy as np
import pytest

from crowdmod_tpu.viz.compare_models import (
    compare_models,
    load_manifest,
    run as compare_run,
)
from crowdmod_tpu.viz.html_viewer import (
    extract_frames,
    generate_html,
    run as viewer_run,
    scan_lambda_dirs,
    scan_model_dirs,
)


def _model_dir(tmp_path, name, offset=0.0):
    d = tmp_path / name
    d.mkdir(parents=True)
    rng = np.random.default_rng(hash(name) % 2**31)
    manifest = {"title": name}
    for metric, cols in [("PSNR", "rho,vx,vy"), ("SSIM", "rho,vx,vy"),
                         ("MF_BHATT_COEF", "c2,c1"), ("MF_BHATT_DIST", "d2,d1")]:
        data = rng.uniform(0, 1, (20, len(cols.split(",")))) + offset
        p = d / f"{metric}_NS64_{name}.csv"
        np.savetxt(p, data, delimiter=",", header=cols, comments="", fmt="%.4f")
        manifest[metric] = str(p)
    with open(d / "metrics_files.json", "w") as f:
        json.dump(manifest, f)
    return str(d)


def test_compare_models_suite(tmp_path):
    d1 = _model_dir(tmp_path, "DDPM-UNet")
    d2 = _model_dir(tmp_path, "FM-UNet", offset=0.3)
    loaded = load_manifest(d1)
    assert loaded["PSNR"].shape == (20, 3)

    out = tmp_path / "cmp"
    artifacts = compare_models([d1, d2], str(out))
    assert os.path.exists(artifacts["PSNR"])
    assert os.path.exists(artifacts["BHATT"])
    summary = open(artifacts["summary"]).read().splitlines()
    assert summary[0].startswith("model,")
    assert len(summary) == 3

    # CLI path.
    assert compare_run([d1, d2, "--output-dir", str(tmp_path / "cmp2")]) == 0


def _gif_dir(tmp_path, name, n_gifs=2, n_frames=3):
    from PIL import Image

    d = tmp_path / name
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for g in range(n_gifs):
        frames = [
            Image.fromarray(
                rng.integers(0, 255, (16, 24, 3), dtype=np.uint8), "RGB"
            )
            for _ in range(n_frames)
        ]
        frames[0].save(
            d / f"mprops_seq_{g + 1}.gif", save_all=True,
            append_images=frames[1:], duration=200, loop=0,
        )
    return str(d)


def test_html_viewer_models_mode(tmp_path):
    d1 = _gif_dir(tmp_path / "samples", "DDPM-UNet")
    d2 = _gif_dir(tmp_path / "samples", "FM-UNet")
    grid = scan_model_dirs([d1, d2])
    assert set(grid) == {"DDPM-UNet", "FM-UNet"}
    assert set(grid["DDPM-UNet"]) == {"mprops_seq_1", "mprops_seq_2"}

    frames = extract_frames(
        grid["DDPM-UNet"]["mprops_seq_1"], str(tmp_path / "cache")
    )
    assert len(frames) == 3 and all(os.path.exists(f) for f in frames)

    out = generate_html(grid, str(tmp_path / "viewer.html"))
    page = open(out).read()
    assert "data:image/png;base64," in page
    assert "DDPM-UNet" in page and "togglePlay" in page


def test_html_viewer_no_embed_rows_keep_distinct_frames(tmp_path):
    """Both model dirs ship identically-named GIFs; the cached PNGs must not
    collide (each row must reference its own frames, not the last row's)."""
    d1 = _gif_dir(tmp_path / "samples", "DDPM-UNet")
    d2 = _gif_dir(tmp_path / "samples", "FM-UNet")
    grid = scan_model_dirs([d1, d2])
    out = generate_html(grid, str(tmp_path / "viewer.html"), embed=False)
    page = open(out).read()
    start = page.index("const FRAMES = ") + len("const FRAMES = ")
    frames_js = json.loads(page[start:page.index(";\n", start)])
    row1 = [v for k, v in frames_js.items() if k.startswith("DDPM_UNet")]
    row2 = [v for k, v in frames_js.items() if k.startswith("FM_UNet")]
    assert row1 and row2
    paths1 = {p for fr in row1 for p in fr}
    paths2 = {p for fr in row2 for p in fr}
    assert not paths1 & paths2, "rows share cached frame files"
    out_dir = os.path.dirname(out)
    for p in paths1 | paths2:
        assert os.path.exists(os.path.join(out_dir, p))


def test_html_viewer_lambda_mode(tmp_path):
    parent = tmp_path / "sweep"
    for lam in ("0.5", "2.0", "1.0"):
        _gif_dir(parent, f"run_lambda_{lam}", n_gifs=1)
    grid = scan_lambda_dirs(str(parent))
    # Numeric λ ordering, not lexicographic.
    assert list(grid) == ["run_lambda_0.5", "run_lambda_1.0", "run_lambda_2.0"]
    rc = viewer_run([str(parent), "--mode", "lambda",
                     "--output", str(tmp_path / "lam.html")])
    assert rc == 0
    assert os.path.exists(tmp_path / "lam.html")


def test_html_viewer_models_file(tmp_path, capsys):
    """--models-file resolves a MODELS yaml under --main-models-dir in file
    order (reference gif_comparison_viewer.py:847 workflow), and
    --list-models prints the GIF-bearing subdirs to copy into it."""
    import yaml

    _gif_dir(tmp_path / "samples", "DDPM-UNet")
    _gif_dir(tmp_path / "samples", "FM-UNet")
    (tmp_path / "samples" / "empty").mkdir()

    rc = viewer_run(["--list-models",
                     "--main-models-dir", str(tmp_path / "samples")])
    assert rc == 0
    assert capsys.readouterr().out.split() == ["DDPM-UNet", "FM-UNet"]

    models_yml = tmp_path / "models_list.yml"
    models_yml.write_text(yaml.safe_dump({"MODELS": ["FM-UNet", "DDPM-UNet"]}))
    out = tmp_path / "viewer.html"
    rc = viewer_run(["--models-file", str(models_yml),
                     "--main-models-dir", str(tmp_path / "samples"),
                     "--output", str(out)])
    assert rc == 0
    page = open(out).read()
    # Display order follows the models file, not directory order.
    assert page.index("FM-UNet") < page.index("DDPM-UNet")


def test_html_viewer_requires_dirs():
    with pytest.raises(SystemExit):
        viewer_run(["--mode", "models"])
