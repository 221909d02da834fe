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
        assert cfg.MACROPROPS.ROWS > 0
        assert cfg.DATASET.PAST_LEN == 5
