from .kitti_eval import bev_box_overlap, d3_box_overlap, eval_class, kitti_eval
from .results import (detections_to_kitti_annos,
                      cam_detections_to_kitti_annos,
                      pseudo_lidar_boxes_to_cam)
