import pytest

from crowdmod_tpu.config import FrozenConfig, load_config, config_dir


def test_load_atc(atc_cfg):
    assert atc_cfg.DATASET.NAME == "ATC"
    assert atc_cfg.MACROPROPS.ROWS == 12
    assert atc_cfg.MACROPROPS.COLS == 36
    assert atc_cfg.DATASET.PAST_LEN == 5
    assert atc_cfg.DATASET.FUTURE_LEN == 3
    assert atc_cfg.MODEL.DDPM.TIMESTEPS == 1000
    assert atc_cfg.MODEL.DDPM.SCALE == 0.5
    # Lists freeze into tuples.
    assert atc_cfg.MODEL.DDPM.UNET.BASE_CH_MULT == (1, 2, 4)


def test_frozen_is_immutable_and_hashable(atc_cfg):
    with pytest.raises(AttributeError):
        atc_cfg.DATASET = {}
    assert hash(atc_cfg) == hash(load_config(config_dir() / "ATC.yml"))


def test_two_file_merge(tmp_path):
    (tmp_path / "a.yml").write_text("A: {x: 1}\nB: 2\n")
    (tmp_path / "files.yml").write_text("DATA_LIST: [[f1.pkl, 10], [f2.pkl, 20]]\n")
    cfg = load_config(tmp_path / "a.yml", tmp_path / "files.yml")
    assert cfg.A.x == 1
    assert cfg.DATA_LIST == (("f1.pkl", 10), ("f2.pkl", 20))


def test_config_dir_env_override(tmp_path, monkeypatch):
    # Non-editable installs point CROWDMOD_CONFIG_DIR at their own configs
    # directory; bare names must resolve there instead of the repo layout.
    (tmp_path / "MINI.yml").write_text("DATASET: {NAME: mini}\n")
    monkeypatch.setenv("CROWDMOD_CONFIG_DIR", str(tmp_path))
    assert config_dir() == tmp_path
    assert load_config("MINI.yml").DATASET.NAME == "mini"


def test_override_merge(atc_cfg):
    cfg2 = atc_cfg.updated({"MODEL": {"DDPM": {"TIMESTEPS": 50}}})
    assert cfg2.MODEL.DDPM.TIMESTEPS == 50
    # Siblings preserved.
    assert cfg2.MODEL.DDPM.SCALE == atc_cfg.MODEL.DDPM.SCALE
    assert atc_cfg.MODEL.DDPM.TIMESTEPS == 1000


def test_get_path(atc_cfg):
    assert atc_cfg.get_path("MODEL.DDPM.UNET.BASE_CH") == 32
    assert atc_cfg.get_path("NO.SUCH.PATH", 7) == 7


def test_all_bundled_configs_parse():
    for yml in config_dir().rglob("*.yml"):
        cfg = load_config(yml)
        if yml.name.endswith("_datafiles.yml"):
            assert len(cfg.DATA_LIST) > 0
            continue
        if yml.name == "models_list.yml":  # viewer input, not a dataset cfg
            assert len(cfg.MODELS) > 0
            continue
        assert cfg.MACROPROPS.ROWS > 0
        # ATC_medium ships the reference's 8+8 overlap variant; every other
        # dataset config uses the canonical 5+3 window.
        expected_past = 8 if yml.name == "ATC_medium.yml" else 5
        assert cfg.DATASET.PAST_LEN == expected_past
        assert (cfg.DATASET.PAST_LEN + cfg.DATASET.FUTURE_LEN
                <= cfg.DATASET.RAW_SEQ_LEN)


def test_gen_configs_is_in_sync(tmp_path, monkeypatch, capsys):
    """configs/ must be exactly what tools/gen_configs.py generates — the
    script is the single source of truth."""
    import importlib.util
    import os
    import pathlib
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "gen_configs", repo / "tools" / "gen_configs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.OUT = tmp_path
    mod.main()

    generated = sorted(p.relative_to(tmp_path) for p in tmp_path.rglob("*.yml"))
    shipped = sorted(
        p.relative_to(repo / "configs")
        for p in (repo / "configs").rglob("*.yml")
    )
    assert generated == shipped
    for rel in generated:
        assert (tmp_path / rel).read_text() == (
            repo / "configs" / rel
        ).read_text(), f"configs/{rel} out of sync with tools/gen_configs.py"


def test_schema_defaults_materialized(atc_cfg, tmp_path):
    """load_config fills schema defaults so optional keys are real
    attributes at runtime, and preserves unknown keys."""
    import yaml

    from crowdmod_tpu.config import load_config

    d = atc_cfg.to_dict()
    del d["MODEL"]["DDPM"]["SCALE"]
    d["MODEL"]["FM"].pop("INTEGRATOR", None)
    d["CUSTOM_ANNOTATION"] = {"x": 1}
    p = tmp_path / "partial.yml"
    with open(p, "w") as f:
        yaml.safe_dump(d, f)
    cfg = load_config(p)
    assert cfg.MODEL.DDPM.SCALE == 1.0          # schema default
    assert cfg.MODEL.FM.INTEGRATOR == "Euler"   # schema default
    assert cfg.MODEL.DDPM.UNET.NUM_RES_BLOCKS == 1
    assert cfg.MODEL.DDPM.UNET.TRAIN.SOLVER.SCHEDULER.FACTOR == 0.5
    assert cfg.CUSTOM_ANNOTATION.x == 1         # unknown keys survive
    # Explicit values always win over defaults.
    assert cfg.DATASET.BATCH_SIZE == atc_cfg.DATASET.BATCH_SIZE


def test_convrnn_geometry_validation(atc_cfg):
    from crowdmod_tpu.config.validate import validate_config

    bad = atc_cfg.updated({"MACROPROPS": {"ROWS": 10}})
    problems = validate_config(bad, "ConvRNN")
    assert any("divisible by 4" in p for p in problems), problems
    ok = validate_config(atc_cfg, "ConvRNN")
    assert not ok


def test_structure_raises_on_missing_required():
    from crowdmod_tpu.config.schema import TypedConfig, structure

    with pytest.raises(ValueError, match="required field is missing"):
        structure(TypedConfig, {"DATASET": {}})
