"""Detector builder: config dict -> (module, loss, predict).

Equivalent of the reference's registry `build_detector`
(mmdet3d/models/builder.py + DETECTORS registry): every detector in
the zoo is constructible from a plain `model = dict(type=..., ...)`
config (runtime/config.py loads those), giving tools/ and tests one
uniform entry point. Config-dict keys are matched to the detector
config dataclass's fields; nested dataclass fields (e.g. CenterPoint's
`head`) accept nested dicts.
"""

import dataclasses
from typing import Any, Callable, NamedTuple

import jax.numpy as jnp

__all__ = ['DetectorHandle', 'build_detector', 'detector_types']


class DetectorHandle(NamedTuple):
    type: str
    module: Any          # flax nn.Module, ready to init/apply
    cfg: Any             # the detector's config dataclass
    loss_fn: Callable    # detector-specific signature (see each module)
    predict_fn: Callable


def _mk_cfg(cls, d):
    """Build dataclass `cls` from dict `d`, ignoring unknown keys and
    recursing into dataclass-typed fields."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        f = fields[k]
        if isinstance(v, dict) and dataclasses.is_dataclass(f.type):
            v = _mk_cfg(f.type, v)
        elif isinstance(v, dict) and f.default_factory is not \
                dataclasses.MISSING and dataclasses.is_dataclass(
                    f.default_factory):
            v = _mk_cfg(f.default_factory, v)
        elif isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[k] = v
    return cls(**kwargs)


def _build_dfm(mc, dtype):
    from .detectors.dfm import DfM, DfMConfig, dfm_loss, dfm_predict
    cfg = _mk_cfg(DfMConfig, mc)
    return DfM(cfg=cfg, dtype=dtype), cfg, dfm_loss, dfm_predict


def _build_dfm_full(mc, dtype):
    from .detectors.dfm import DfMConfig, dfm_predict
    from .detectors.dfm_full import DfMFull, dfm_full_loss
    from .heads.atss2d import ATSS2DConfig
    cfg = _mk_cfg(DfMConfig, mc)
    atss = _mk_cfg(ATSS2DConfig, mc.get('atss', {}))
    return (DfMFull(cfg=cfg, atss_cfg=atss, dtype=dtype), cfg,
            dfm_full_loss, dfm_predict)


def _build_mvdfm(mc, dtype):
    from .detectors.multiview_dfm import (MultiViewDfM, MVDfMConfig,
                                          mvdfm_loss, mvdfm_predict)
    cfg = _mk_cfg(MVDfMConfig, mc)
    return MultiViewDfM(cfg=cfg, dtype=dtype), cfg, mvdfm_loss, mvdfm_predict


def _build_fcos3d(mc, dtype):
    from .detectors.fcos_mono3d import (FCOSMono3D, fcos_mono3d_loss,
                                        fcos_mono3d_predict)
    from .heads.fcos_mono3d import FCOS3DConfig
    cfg = _mk_cfg(FCOS3DConfig, mc)
    return (FCOSMono3D(cfg=cfg,
                       backbone_depth=mc.get('backbone_depth', 101),
                       dtype=dtype),
            cfg, fcos_mono3d_loss, fcos_mono3d_predict)


def _build_pgd(mc, dtype):
    from .detectors.pgd_mono3d import (PGDMono3D, pgd_mono3d_loss,
                                       pgd_mono3d_predict)
    from .heads.pgd import PGDConfig
    cfg = _mk_cfg(PGDConfig, mc)
    return (PGDMono3D(cfg=cfg,
                      backbone_depth=mc.get('backbone_depth', 101),
                      dtype=dtype),
            cfg, pgd_mono3d_loss, pgd_mono3d_predict)


def _build_monoflex(mc, dtype):
    from .detectors.monoflex import (MonoFlex, MonoFlexConfig,
                                     monoflex_loss, monoflex_predict)
    cfg = _mk_cfg(MonoFlexConfig, mc)
    return (MonoFlex(cfg=cfg, dtype=dtype), cfg, monoflex_loss,
            monoflex_predict)


def _build_smoke(mc, dtype):
    from .detectors.smoke import (SMOKEConfig, SMOKEMono3D, smoke_loss,
                                  smoke_predict)
    cfg = _mk_cfg(SMOKEConfig, mc)
    return SMOKEMono3D(cfg=cfg, dtype=dtype), cfg, smoke_loss, smoke_predict


def _build_imvoxelnet(mc, dtype):
    from .detectors.imvoxelnet import (ImVoxelNet, ImVoxelNetConfig,
                                       imvoxelnet_loss, imvoxelnet_predict)
    cfg = _mk_cfg(ImVoxelNetConfig, mc)
    return (ImVoxelNet(cfg=cfg, dtype=dtype), cfg, imvoxelnet_loss,
            imvoxelnet_predict)


def _build_voxelnet(mc, dtype):
    from .detectors.voxelnet import (VoxelNet, VoxelNetConfig,
                                     voxelnet_loss, voxelnet_predict)
    cfg = _mk_cfg(VoxelNetConfig, mc)
    return (VoxelNet(cfg=cfg, dtype=dtype), cfg, voxelnet_loss,
            voxelnet_predict)


def _build_dynamic_voxelnet(mc, dtype):
    from .detectors.dynamic_voxelnet import (DynamicVoxelNet,
                                             DynamicVoxelNetConfig,
                                             dynamic_voxelnet_loss,
                                             dynamic_voxelnet_predict)
    cfg = _mk_cfg(DynamicVoxelNetConfig, mc)
    return (DynamicVoxelNet(cfg=cfg, dtype=dtype), cfg,
            dynamic_voxelnet_loss, dynamic_voxelnet_predict)


def _build_votenet(mc, dtype):
    from .detectors.votenet import (VoteNet, VoteNetConfig,
                                    votenet_loss, votenet_predict)
    cfg = _mk_cfg(VoteNetConfig, mc)
    return (VoteNet(cfg=cfg, dtype=dtype), cfg, votenet_loss,
            votenet_predict)


def _build_ssd3d(mc, dtype):
    from .detectors.ssd3d import (SSD3DConfig, SSD3DNet, ssd3d_loss,
                                  ssd3d_predict)
    cfg = _mk_cfg(SSD3DConfig, mc)
    return (SSD3DNet(cfg=cfg, dtype=dtype), cfg, ssd3d_loss,
            ssd3d_predict)


def _build_groupfree3d(mc, dtype):
    from .detectors.groupfree3d import (GroupFree3DConfig, GroupFree3DNet,
                                        groupfree3d_loss,
                                        groupfree3d_predict)
    cfg = _mk_cfg(GroupFree3DConfig, mc)
    return (GroupFree3DNet(cfg=cfg, dtype=dtype), cfg, groupfree3d_loss,
            groupfree3d_predict)


def _build_point_rcnn(mc, dtype):
    from .detectors.point_rcnn import (PointRCNN, PointRCNNConfig,
                                       point_rcnn_loss,
                                       point_rcnn_predict)
    cfg = _mk_cfg(PointRCNNConfig, mc)
    return (PointRCNN(cfg=cfg, dtype=dtype), cfg, point_rcnn_loss,
            point_rcnn_predict)


def _build_imvotenet(mc, dtype):
    from .detectors.imvotenet import (ImVoteNet, ImVoteNetConfig,
                                      imvotenet_loss, imvotenet_predict)
    cfg = _mk_cfg(ImVoteNetConfig, mc)
    return (ImVoteNet(cfg=cfg, dtype=dtype), cfg, imvotenet_loss,
            imvotenet_predict)


def _build_mvx(mc, dtype):
    from .detectors.mvx_two_stage import (MVXConfig, MVXFasterRCNN,
                                          mvx_loss, mvx_predict)
    cfg = _mk_cfg(MVXConfig, mc)
    return MVXFasterRCNN(cfg=cfg, dtype=dtype), cfg, mvx_loss, mvx_predict


def _build_parta2(mc, dtype):
    from .detectors.parta2 import (PartA2, PartA2Config, parta2_loss,
                                   parta2_predict)
    cfg = _mk_cfg(PartA2Config, mc)
    return PartA2(cfg=cfg, dtype=dtype), cfg, parta2_loss, parta2_predict


def _build_h3dnet(mc, dtype):
    from .detectors.h3dnet import (H3DNet, H3DNetConfig, h3dnet_loss,
                                   h3dnet_predict)
    cfg = _mk_cfg(H3DNetConfig, mc)
    return H3DNet(cfg=cfg, dtype=dtype), cfg, h3dnet_loss, h3dnet_predict


def _build_sassd(mc, dtype):
    from .detectors.sassd import (SASSD, SASSDConfig, sassd_loss,
                                  sassd_predict)
    cfg = _mk_cfg(SASSDConfig, mc)
    return SASSD(cfg=cfg, dtype=dtype), cfg, sassd_loss, sassd_predict


def _build_centerpoint(mc, dtype):
    from .detectors.centerpoint import (CenterPoint, CenterPointConfig,
                                        centerpoint_loss,
                                        centerpoint_predict)
    cfg = _mk_cfg(CenterPointConfig, mc)
    return (CenterPoint(cfg=cfg, dtype=dtype), cfg, centerpoint_loss,
            centerpoint_predict)


def _build_encoder_decoder3d(mc, dtype):
    from .segmentors.encoder_decoder import (EncoderDecoder3D,
                                             EncoderDecoder3DConfig,
                                             encoder_decoder3d_loss,
                                             encoder_decoder3d_predict)
    cfg = _mk_cfg(EncoderDecoder3DConfig, mc)
    return (EncoderDecoder3D(cfg=cfg, dtype=dtype), cfg,
            encoder_decoder3d_loss, encoder_decoder3d_predict)


_BUILDERS = {
    'DfM': _build_dfm,
    'EncoderDecoder3D': _build_encoder_decoder3d,
    'DfMFull': _build_dfm_full,
    'MultiViewDfM': _build_mvdfm,
    'FCOSMono3D': _build_fcos3d,
    'PGD': _build_pgd,
    'SMOKEMono3D': _build_smoke,
    'MonoFlex': _build_monoflex,
    'ImVoxelNet': _build_imvoxelnet,
    'VoxelNet': _build_voxelnet,
    'DynamicVoxelNet': _build_dynamic_voxelnet,
    'CenterPoint': _build_centerpoint,
    'VoteNet': _build_votenet,
    'SSD3DNet': _build_ssd3d,
    'GroupFree3DNet': _build_groupfree3d,
    'SASSD': _build_sassd,
    'PointRCNN': _build_point_rcnn,
    'ImVoteNet': _build_imvotenet,
    'MVXFasterRCNN': _build_mvx,
    'PartA2': _build_parta2,
    'H3DNet': _build_h3dnet,
    'DynamicMVXFasterRCNN': _build_mvx,
}


def detector_types():
    return sorted(_BUILDERS)


def _backbone_registry():
    """type name -> flax module class (reference BACKBONES registry,
    models/builder.py:16: every backbone is constructible by its
    config type string)."""
    from .backbones.dgcnn import DGCNNBackbone
    from .backbones.dla import DLANet
    from .backbones.liga_resnet import LIGAResNet
    from .backbones.mink_resnet import MinkResNet
    from .backbones.multi_backbone import MultiBackbone
    from .backbones.nostem_regnet import NoStemRegNet
    from .backbones.pointnet2 import PointNet2SASSG
    from .backbones.pointnet2_msg import PointNet2SAMSG
    from .backbones.second import SECOND
    return {
        'LIGAResNet': LIGAResNet,
        'DLANet': DLANet,
        'SECOND': SECOND,
        'PointNet2SASSG': PointNet2SASSG,
        'PointNet2SAMSG': PointNet2SAMSG,
        'DGCNNBackbone': DGCNNBackbone,
        'MinkResNet': MinkResNet,
        'NoStemRegNet': NoStemRegNet,
        'MultiBackbone': MultiBackbone,
    }


def backbone_types():
    return sorted(_backbone_registry())


def build_backbone(cfg_dict, dtype=jnp.float32):
    """cfg_dict: {'type': name, **module kwargs} -> flax module
    instance (the reference's build_backbone surface)."""
    d = dict(cfg_dict)
    t = d.pop('type')
    reg = _backbone_registry()
    if t not in reg:
        raise KeyError(f'unknown backbone type {t!r}; known: '
                       f'{backbone_types()}')
    d = {k: (tuple(tuple(x) if isinstance(x, list) else x for x in v)
             if isinstance(v, list) else v) for k, v in d.items()}
    return reg[t](dtype=dtype, **d)


def build_detector(model_cfg, dtype=None):
    """model_cfg: dict with 'type' plus config fields (see each
    detector's Config dataclass). An optional 'dtype' key (e.g.
    'bfloat16' — the fp16 configs' TPU analog) sets the compute dtype;
    the `dtype` argument overrides it. Returns a DetectorHandle."""
    mc = dict(model_cfg)
    t = mc.pop('type')
    cfg_dtype = mc.pop('dtype', None)
    if dtype is None:
        dtype = jnp.dtype(cfg_dtype).type if cfg_dtype else jnp.float32
    if t not in _BUILDERS:
        raise KeyError(f'unknown detector type {t!r}; known: '
                       f'{detector_types()}')
    module, cfg, loss_fn, predict_fn = _BUILDERS[t](mc, dtype)
    return DetectorHandle(t, module, cfg, loss_fn, predict_fn)
