"""Config validation tests: every shipped config is valid; broken configs
produce actionable error lists."""

import pytest

from crowdmod_tpu.config import load_config
from crowdmod_tpu.config.loader import is_datafile_list
from crowdmod_tpu.config.validate import require_valid, validate_config


def test_all_shipped_configs_valid():
    import pathlib

    import yaml

    repo = pathlib.Path(__file__).resolve().parents[1]
    ymls = sorted((repo / "configs").rglob("*.yml"))
    assert ymls
    for yml in ymls:
        if yml.name == "models_list.yml":
            # HTML-viewer models list (reference config/models_list.yml),
            # not a dataset config.
            with open(yml) as f:
                data = yaml.safe_load(f)
            assert set(data) == {"MODELS"}, yml.name
            continue
        if is_datafile_list(yml):
            # Companion datafile lists (reference config/ATC_datafiles.yml,
            # ATC_DSlist4test_one.yml shapes), not full configs — classified
            # by content, exactly as crowdmod doctor does (the round-2
            # suffix-matching defect lived here too).
            with open(yml) as f:
                data = yaml.safe_load(f)
            entries = data if isinstance(data, list) else data["DATA_LIST"]
            for entry in entries:
                # Both reference forms: bare filename, or (filename, count).
                if isinstance(entry, str):
                    continue
                name, count = entry
                assert isinstance(name, str) and isinstance(count, int), yml.name
            continue
        cfg = load_config(yml)
        problems = validate_config(cfg)
        assert not problems, f"{yml.name}: {problems}"


def test_missing_section(atc_cfg):
    broken = dict(atc_cfg.to_dict())
    del broken["METRICS"]
    from crowdmod_tpu.config import FrozenConfig

    problems = validate_config(FrozenConfig(broken))
    assert any("METRICS" in p for p in problems)


def test_bad_values(atc_cfg):
    cfg = atc_cfg.updated({
        "MACROPROPS": {"ROWS": -3},
        "MODEL": {"DDPM": {"SAMPLER": "Magic", "GUIDANCE": "Vibes"}},
    })
    problems = validate_config(cfg)
    joined = "\n".join(problems)
    assert "MACROPROPS.ROWS" in joined
    assert "SAMPLER" in joined and "Magic" in joined
    assert "GUIDANCE" in joined and "Vibes" in joined
    with pytest.raises(ValueError, match="invalid configuration"):
        require_valid(cfg)


def test_typed_config_view(atc_cfg):
    from crowdmod_tpu.config.schema import typed_config

    t = typed_config(atc_cfg)
    assert t.MACROPROPS.ROWS == 12 and t.MACROPROPS.COLS == 36
    assert t.DATASET.PAST_LEN == 5 and t.DATASET.FUTURE_LEN == 3
    assert t.MODEL.DDPM.TIMESTEPS == 1000
    assert t.MODEL.DDPM.UNET.BASE_CH_MULT == (1, 2, 4)
    assert t.MODEL.DDPM.UNET.TRAIN.SOLVER.BETAS == (0.5, 0.999)
    assert t.MODEL.FM.INTEGRATOR_STEPS.EULER == 1000
    assert t.MODEL.CONVRNN.CELL_CLASS == "ConvGRUCell"
    assert t.TPU.COMPUTE_DTYPE == "bfloat16"
    # Frozen: misassignment is impossible, not just discouraged.
    with pytest.raises(Exception):
        t.MACROPROPS.ROWS = 13


def test_typed_config_reports_all_problems(atc_cfg):
    from crowdmod_tpu.config.schema import typed_config

    cfg = atc_cfg.updated({
        "DATASET": {"PAST_LEN": "five"},
        "MODEL": {"DDPM": {"TIMESTEPS": -1},
                  "CONVRNN": {"CELL_CLASS": "ConvTardisCell"}},
    })
    with pytest.raises(ValueError) as exc:
        typed_config(cfg)
    msg = str(exc.value)
    assert "DATASET.PAST_LEN" in msg
    assert "MODEL.DDPM.TIMESTEPS" in msg
    assert "ConvTardisCell" in msg


def test_schema_type_errors_are_caught(atc_cfg):
    # Wrong element type inside a tuple field, reported with its index.
    cfg = atc_cfg.updated(
        {"MODEL": {"DDPM": {"UNET": {"BASE_CH_MULT": [1, "two", 4]}}}}
    )
    problems = validate_config(cfg)
    assert any("BASE_CH_MULT[1]" in p for p in problems)

    # bool is not an int (Python would happily treat True as 1).
    cfg = atc_cfg.updated({"MACROPROPS": {"ROWS": True}})
    problems = validate_config(cfg)
    assert any("MACROPROPS.ROWS" in p and "int" in p for p in problems)


def test_geometry_rules(atc_cfg):
    # DiT patch indivisibility.
    cfg = atc_cfg.updated({"MODEL": {"DDPM": {"DIT": {"PATCH_SIZE": 5}}}})
    problems = validate_config(cfg, "DDPM-DiT")
    assert any("PATCH_SIZE 5" in p for p in problems)

    # UNet halving rule: 3 levels need dims divisible by 4.
    cfg = atc_cfg.updated({"MACROPROPS": {"ROWS": 10}})
    problems = validate_config(cfg, "DDPM-UNet")
    assert any("ROWS" in p and "levels" in p for p in problems)

    # Unknown arch.
    assert any("unknown arch" in p
               for p in validate_config(atc_cfg, "Transformer-XL"))
