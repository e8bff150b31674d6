"""Full-model torch->flax checkpoint import: layout coverage on the
whole DfM tree + numerical parity of composite submodules against
torch replicas assembled to the reference layer layout."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from dfm_tpu.utils import checkpoint_import as CI  # noqa: E402


def _tiny_dfm_template():
    from dfm_tpu.models import BatchMeta, DfM, DfMConfig
    cfg = DfMConfig(depth_num_bins=16, voxel_size=(7.2, 7.6, 1.0),
                    nms_pre=64, max_num=8)
    model = DfM(cfg=cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 2, 32, 64, 3).astype(np.float32))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 36.0
    cam[0, 2], cam[1, 2] = 32, 16
    meta = BatchMeta.identity(1, jnp.asarray(cam)[None])
    meta = dataclasses.replace(meta, org_w=jnp.full((1,), 64.0))
    variables = model.init(jax.random.PRNGKey(0), img, meta, train=False)
    return model, cfg, variables, img, meta


def test_full_tree_coverage_and_roundtrip():
    """Every flax leaf of the DfM model is written by the importer from
    a state_dict with the reference key layout (strict both ways)."""
    _, _, variables, _, _ = _tiny_dfm_template()
    shapes = CI.expected_torch_shapes(variables)
    rng = np.random.RandomState(0)
    sd = {k: torch.from_numpy(rng.randn(*s).astype(np.float32))
          for k, s in shapes.items()}
    out = CI.import_dfm_state_dict(sd, variables, strict=True)
    # spot checks: conv kernel orientation + bn stats routing
    np.testing.assert_allclose(
        out['params']['backbone']['Conv_0']['kernel'],
        sd['backbone.conv1.weight'].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        out['batch_stats']['backbone']['BatchNorm_0']['mean'],
        sd['backbone.bn1.running_mean'].numpy())
    np.testing.assert_allclose(
        out['params']['backbone_stereo']['dres0_stereo']['Conv_0']['kernel'],
        sd['backbone_stereo.dres0.conv.weight'].numpy()
        .transpose(2, 3, 4, 1, 0))


def test_missing_torch_key_raises():
    _, _, variables, _, _ = _tiny_dfm_template()
    shapes = CI.expected_torch_shapes(variables)
    sd = {k: torch.zeros(*s) for k, s in shapes.items()}
    del sd['bbox_head_3d.conv_cls.weight']
    with pytest.raises(KeyError):
        CI.import_dfm_state_dict(sd, variables, strict=True)


def test_convtranspose3d_mapping_parity():
    """torch ConvTranspose3d(k3 s2 p1 op1) == flax ConvTransposeNorm's
    conv with the flip-transposed kernel."""
    from dfm_tpu.models.layers import ConvTransposeNorm
    ci, co = 6, 4
    tconv = torch.nn.ConvTranspose3d(ci, co, 3, stride=2, padding=1,
                                     output_padding=1, bias=False)
    x = np.random.RandomState(0).randn(1, ci, 5, 6, 7).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    mod = ConvTransposeNorm(co, ndim=3, norm='none')
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    var = mod.init(jax.random.PRNGKey(0), xj)
    kernel = CI.convt3d_kernel(tconv.weight)
    var = {'params': {'ConvTranspose_0': {'kernel': jnp.asarray(kernel)}}}
    out = mod.apply(var, xj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref,
        rtol=1e-4, atol=1e-4)


def _torch_hourglass3d(c):
    """Reference hourglass layout (conv_modules.py:73-140) from plain
    torch primitives, GN norm."""
    def convbn3(ci, co, stride):
        return torch.nn.Sequential(
            torch.nn.Conv3d(ci, co, 3, stride=stride, padding=1,
                            bias=False),
            torch.nn.GroupNorm(min(32, co), co))
    m = torch.nn.Module()
    m.conv1 = torch.nn.Sequential(convbn3(c, c * 2, 2), torch.nn.ReLU())
    m.conv2 = convbn3(c * 2, c * 2, 1)
    m.conv3 = torch.nn.Sequential(convbn3(c * 2, c * 2, 2), torch.nn.ReLU())
    m.conv4 = torch.nn.Sequential(convbn3(c * 2, c * 2, 1), torch.nn.ReLU())
    m.conv5 = torch.nn.Sequential(
        torch.nn.ConvTranspose3d(c * 2, c * 2, 3, padding=1,
                                 output_padding=1, stride=2, bias=False),
        torch.nn.GroupNorm(min(32, c * 2), c * 2))
    m.conv6 = torch.nn.Sequential(
        torch.nn.ConvTranspose3d(c * 2, c, 3, padding=1, output_padding=1,
                                 stride=2, bias=False),
        torch.nn.GroupNorm(min(32, c), c))

    def fwd(x):
        out = m.conv1(x)
        pre = m.conv2(out)
        pre = torch.relu(pre)
        out = m.conv3(pre)
        out = m.conv4(out)
        post = torch.relu(m.conv5(out) + pre)
        out = m.conv6(post)
        return out
    m.fwd = fwd
    return m


def test_hourglass3d_import_parity():
    """Imported weights reproduce the torch hourglass forward."""
    from dfm_tpu.models.layers import Hourglass
    c = 8
    tm = _torch_hourglass3d(c)
    x = np.random.RandomState(1).randn(1, c, 8, 8, 12).astype(np.float32)
    with torch.no_grad():
        ref = tm.fwd(torch.from_numpy(x)).numpy()

    key_map = CI._hourglass('hg', ('hg',), 3)
    sd = {f'hg.{k}': v for k, v in tm.state_dict().items()}
    mod = Hourglass(c, ndim=3, norm='gn')
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    template = mod.init(jax.random.PRNGKey(0), xj)
    template = {'params': {'hg': template['params']}}
    out_vars = CI.import_dfm_state_dict(sd, template, key_map=key_map,
                                        strict=True)
    out, _, _ = mod.apply({'params': out_vars['params']['hg']}, xj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref,
        rtol=1e-3, atol=1e-3)


def test_resnet_block_import_parity():
    """LigaBasicBlock (conv-bn-relu-conv-bn[-relu]) import parity."""
    import torch.nn as tnn
    from dfm_tpu.models.backbones.liga_resnet import LIGAResNet  # noqa
    ci = 8

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(ci, ci, 3, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(ci)
            self.conv2 = tnn.Conv2d(ci, ci, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(ci)

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out)) + x
            return torch.relu(out)

    tb = Block().eval()
    with torch.no_grad():
        tb.bn1.running_mean.normal_()
        tb.bn1.running_var.uniform_(0.5, 2.0)
        tb.bn2.running_mean.normal_()
        tb.bn2.running_var.uniform_(0.5, 2.0)
    x = np.random.RandomState(2).randn(1, ci, 9, 11).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).numpy()

    # flax equivalent: one LigaBasicBlock; import via the resnet-basic map
    from dfm_tpu.models.backbones.liga_resnet import LigaBasicBlock
    mod = LigaBasicBlock(ci, norm='bn', with_out_relu=True)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = mod.init(jax.random.PRNGKey(0), xj, train=False)
    template = {'params': {'b': template['params']},
                'batch_stats': {'b': template['batch_stats']}}
    key_map = CI._resnet_basic('blk', ('b',), with_downsample=False)
    sd = {f'blk.{k}': v for k, v in tb.state_dict().items()
          if 'num_batches' not in k}
    out_vars = CI.import_dfm_state_dict(sd, template, key_map=key_map,
                                        strict=True)
    out = mod.apply({'params': out_vars['params']['b'],
                     'batch_stats': out_vars['batch_stats']['b']},
                    xj, train=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


# compile-heavy: full tier only (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def test_import_dfm_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """The parity CLI drives .pth -> audit -> import -> tap table ->
    save on a saved torch-replica state_dict (VERDICT r2 item 4)."""
    import sys
    cfg_file = tmp_path / 'tiny_dfm.py'
    cfg_file.write_text(
        "model = dict(type='DfM', depth_num_bins=16,\n"
        "             voxel_size=(7.2, 7.6, 1.0), nms_pre=64,\n"
        "             max_num=8)\n")
    # torch replica state_dict with the reference key layout
    _, _, variables, _, _ = _tiny_dfm_template()
    shapes = CI.expected_torch_shapes(variables)
    rng = np.random.RandomState(0)
    sd = {k: torch.from_numpy((rng.randn(*s) * 0.05).astype(np.float32))
          for k, s in shapes.items()}
    pth = tmp_path / 'replica.pth'
    torch.save({'state_dict': sd}, str(pth))

    sys.path.insert(0, '/root/repo')
    from tools.model_converters import import_dfm
    monkeypatch.setattr(sys, 'argv', [
        'import_dfm.py', str(pth), '--config', str(cfg_file),
        '--image-hw', '32', '64', '--out', str(tmp_path / 'flax_ckpt')])
    import_dfm.main()
    out = capsys.readouterr().out
    assert 'missing: 0' in out
    assert 'shape-mismatched: 0' in out
    assert 'strict import OK' in out
    assert 'depth_cost' in out and 'bev_feat' in out
    assert 'decoded:' in out
    assert (tmp_path / 'flax_ckpt').exists()
