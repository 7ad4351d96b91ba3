"""Config system tests: yacs-compatible semantics, reference YAML surface."""

from pathlib import Path

import pytest

from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.config import config_merge_from_file

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def cfg():
    return default_cfg.clone()


def test_defaults(cfg):
    assert cfg.MODEL is None
    assert cfg.TRAINING.LAMBDA == 1.0
    assert cfg.HEAD.NUM_PTS == 6
    assert cfg.DATASET.QUERY_FRAME_COUNT == 1


def test_merge_layers(cfg):
    cfg.merge_from_file(REPO / "configs/mapfree.yaml")
    assert cfg.DATASET.DATA_SOURCE == "MapFree"
    assert cfg.DATASET.HEIGHT == 720
    # 'None' string in YAML is literal-evaled to None (yacs semantics)
    assert cfg.DATASET.SCENES is None
    assert cfg.DATASET.ESTIMATED_DEPTH is None

    # model yaml overrides dataset yaml (later overwrites earlier)
    cfg.merge_from_file(REPO / "configs/regression/mapfree/3d3d.yaml")
    assert cfg.DATASET.HEIGHT == 360
    assert cfg.DATASET.WIDTH == 270
    assert cfg.ENCODER.TYPE == "ResUNet"
    assert cfg.TRAINING.LR == pytest.approx(1e-4)
    assert cfg.TRAINING.ROT_LOSS == "rot_angle_loss"


def test_unknown_key_rejected(cfg, tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        cfg.merge_from_file(bad)


def test_type_mismatch_rejected(cfg, tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("TRAINING:\n  ROT_LOSS: [1, 2]\n")
    with pytest.raises(ValueError):
        cfg.merge_from_file(bad)


def test_int_float_coercion(cfg, tmp_path):
    f = tmp_path / "ok.yaml"
    f.write_text("TRAINING:\n  LAMBDA: 0\n")
    cfg.merge_from_file(f)
    assert cfg.TRAINING.LAMBDA == 0.0
    assert isinstance(cfg.TRAINING.LAMBDA, float)


def test_merge_from_list(cfg):
    cfg.merge_from_list(["TRAINING.BATCH_SIZE", "16", "MODEL", "Regression"])
    assert cfg.TRAINING.BATCH_SIZE == 16
    assert cfg.MODEL == "Regression"


def test_multi_merge_helper(cfg):
    config_merge_from_file(
        cfg,
        [REPO / "configs/mapfree.yaml", REPO / "configs/mapfree_multi.yaml"],
    )
    assert cfg.DATASET.QUERY_FRAME_COUNT == 9


def test_own_yaml_tree_loads():
    """Every generated config must merge cleanly over its dataset config."""
    dataset_cfgs = {
        "mapfree": REPO / "configs/mapfree.yaml",
        "scannet": REPO / "configs/scannet.yaml",
        "sevenscenes": REPO / "configs/sevenscenes.yaml",
    }
    yamls = sorted((REPO / "configs").rglob("*.yaml"))
    assert len(yamls) > 50
    for y in yamls:
        c = default_cfg.clone()
        for name, dpath in dataset_cfgs.items():
            if name in str(y):
                c.merge_from_file(dpath)
                break
        else:
            c.merge_from_file(REPO / "configs/mapfree.yaml")
        c.merge_from_file(y)


def test_reference_yaml_tree_loads(cfg):
    """The reference repo's own YAML tree must load unmodified (same schema)."""
    ref_cfg_root = Path("/root/reference/config")
    if not ref_cfg_root.exists():
        pytest.skip("reference configs not available")
    yamls = sorted(ref_cfg_root.rglob("*.yaml"))
    assert len(yamls) > 20
    for y in yamls:
        c = default_cfg.clone()
        c.merge_from_file(ref_cfg_root / "mapfree.yaml")
        c.merge_from_file(y)
