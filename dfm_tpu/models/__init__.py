from . import layers
from .backbones.bev_hourglass import BEVHourglass
from .backbones.dfm_backbone import DfMBackbone
from .backbones.liga_resnet import LIGAResNet
from .detectors.dfm import BatchMeta, DfM, DfMConfig, dfm_loss, dfm_predict
from .heads.anchor3d_head import (LIGAAnchor3DHead, anchor3d_head_get_bboxes,
                                  anchor3d_head_loss)
from .necks.frustum_to_voxel import FrustumToVoxel
from .necks.spp_unet import SPPUNetNeck
from .detectors.dfm_with_teacher import (DfMWithTeacher, bev_cell_centers,
                                         dfm_loss_with_imitation)
from .detectors.imitation import cw_scale_normalize, imitation_loss
from .detectors.teacher import LidarTeacher, voxelize_mean
from .detectors.fcos_mono3d import (FCOSMono3D, fcos_mono3d_loss,
                                    fcos_mono3d_predict, mono_level_points)
from .heads.fcos_mono3d import FCOS3DConfig
from .detectors.multiview_dfm import (MultiViewDfM, MVDfMConfig, mvdfm_loss,
                                      mvdfm_predict)
from .necks.fpn import FPN
from .necks.imvoxel_neck import OutdoorImVoxelNeck
from .backbones.resnet import ResNet
from .heads.pgd import PGDConfig, PGDHead, decode_prob_depth, pgd_loss
from .heads.atss2d import ATSS2DConfig, ATSS2DHead, atss2d_loss, atss_assign
from .detectors.voxelnet import (VoxelNet, VoxelNetConfig, voxelnet_loss,
                                 voxelnet_predict)
from .detectors.dfm_full import DfMFull, dfm_full_loss
from .backbones.second import SECOND
from .necks.second_fpn import SECONDFPN
from .detectors.dynamic_voxelnet import (DynamicVoxelNet,
                                         DynamicVoxelNetConfig)
from .detectors.centerpoint import (CenterPoint, CenterPointConfig,
                                    centerpoint_loss, centerpoint_predict)
from .detectors.pgd_mono3d import (PGDMono3D, pgd_mono3d_loss,
                                   pgd_mono3d_predict)
from .builder import DetectorHandle, build_detector, detector_types
