"""Config smoke test: every config in configs/ must load, merge, and
build its model (mirrors the reference's tests/test_runtime/
test_config.py whole-zoo build check)."""

import dataclasses
import glob
import os

import pytest

from dfm_tpu.runtime.config import load_config, merge_options

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs')


def _build_model(cfg):
    m = cfg.model.to_dict()
    t = m.pop('type')
    if t == 'DfM':
        from dfm_tpu.models import DfM, DfMConfig
        fields = {f.name for f in dataclasses.fields(DfMConfig)}
        return DfM(cfg=DfMConfig(
            **{k: v for k, v in m.items() if k in fields}))
    if t == 'FCOSMono3D':
        from dfm_tpu.models import FCOS3DConfig, FCOSMono3D
        fields = {f.name for f in dataclasses.fields(FCOS3DConfig)}
        depth = m.pop('backbone_depth', 101)
        return FCOSMono3D(cfg=FCOS3DConfig(
            **{k: v for k, v in m.items() if k in fields}),
            backbone_depth=depth)
    if t == 'PGD':
        from dfm_tpu.models import PGDConfig, PGDHead
        fields = {f.name for f in dataclasses.fields(PGDConfig)}
        return PGDHead(cfg=PGDConfig(
            **{k: v for k, v in m.items() if k in fields}))
    if t == 'MultiViewDfM':
        from dfm_tpu.models import MultiViewDfM, MVDfMConfig
        fields = {f.name for f in dataclasses.fields(MVDfMConfig)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in m.items() if k in fields}
        return MultiViewDfM(cfg=MVDfMConfig(**kw))
    raise ValueError(t)


@pytest.mark.parametrize('path', sorted(
    glob.glob(os.path.join(CONFIG_DIR, '*.py'))))
def test_config_builds(path):
    cfg = load_config(path)
    assert 'model' in cfg and 'type' in cfg.model
    model = _build_model(cfg)
    assert model is not None
    # CLI override deep-merge works on every config
    cfg2 = merge_options(cfg, ['optimizer.lr=0.12345'])
    assert cfg2.optimizer.lr == 0.12345
