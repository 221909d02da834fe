"""Config validation tests: every shipped config is valid; broken configs
produce actionable error lists."""

import pytest

from crowdmod_tpu.config import load_config
from crowdmod_tpu.config.validate import require_valid, validate_config


def test_all_shipped_configs_valid():
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    for yml in sorted((repo / "configs").rglob("*.yml")):
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
