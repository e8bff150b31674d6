from . import layers
from .backbones.bev_hourglass import BEVHourglass
from .backbones.dfm_backbone import DfMBackbone
from .backbones.liga_resnet import LIGAResNet
from .detectors.dfm import BatchMeta, DfM, DfMConfig, dfm_loss, dfm_predict
from .heads.anchor3d_head import (LIGAAnchor3DHead, anchor3d_head_get_bboxes,
                                  anchor3d_head_loss)
from .necks.frustum_to_voxel import FrustumToVoxel
from .necks.spp_unet import SPPUNetNeck
