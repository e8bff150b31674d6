"""Config smoke test: every config in configs/ must load, merge, and
build its model (mirrors the reference's tests/test_runtime/
test_config.py whole-zoo build check). Model construction goes through
the central registry (models/builder.py); per-family forward tests
live in test_config_zoo.py and the model test files."""

import glob
import os

import pytest

from dfm_tpu.models import build_detector
from dfm_tpu.runtime.config import load_config, merge_options

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs')


@pytest.mark.parametrize('path', sorted(
    glob.glob(os.path.join(CONFIG_DIR, '*.py'))), ids=os.path.basename)
def test_config_builds(path):
    cfg = load_config(path)
    assert 'model' in cfg and 'type' in cfg.model
    handle = build_detector(cfg.model.to_dict())
    assert handle.module is not None
    # CLI override deep-merge works on every config
    cfg2 = merge_options(cfg, ['optimizer.lr=0.12345'])
    assert cfg2.optimizer.lr == 0.12345
