"""Every shipped YAML config must parse and build its network (catches config
schema drift without needing data or a device)."""
from pathlib import Path

import pytest

from pdm_ssd_tpu.utils.config import CfgNode, cfg_from_yaml_file
from pdm_ssd_tpu.models import build_network

REPO = Path(__file__).resolve().parents[1]
CONFIGS = sorted((REPO / 'configs').glob('*_models/*.yaml'))


@pytest.mark.parametrize('cfg_path', CONFIGS, ids=lambda p: p.stem)
def test_config_builds(cfg_path, monkeypatch):
    monkeypatch.chdir(REPO)
    cfg = cfg_from_yaml_file(str(cfg_path), CfgNode())
    assert 'MODEL' in cfg and 'DATA_CONFIG' in cfg and 'OPTIMIZATION' in cfg
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG,
                          class_names=cfg.CLASS_NAMES)
    assert model is not None
    # OPTIMIZATION block must satisfy the optimizer builder's schema
    from pdm_ssd_tpu.runtime.optimization import build_optimizer_and_schedule
    tx, sched = build_optimizer_and_schedule(None, cfg.OPTIMIZATION, 100, 2)
    assert float(sched(0)) > 0
