"""Waymo multi-view dataset (kitti_format layout), for MV-FCOS3D++.

Equivalent of the reference's `WaymoDataset` multi-view machinery
(mmdet3d/datasets/waymo_dataset.py:21-1007 `load_mode='lidar_frame'`,
cam_sync annos, multi-sweep assembly) and the multi-view loader
(`LoadMultiViewImageFromFiles`, pipelines/loading.py:15-205: per-frame
lidar2img selection, ego-motion-rewritten prev-frame lidar2img, padding
heterogeneous view shapes).

Info schema (produced by `build_waymo_infos` from a kitti_format tree,
or convertible from the official TFRecords offline):

  info = {
    'sample_idx': int,
    'images': [{'image_path', 'lidar2img' (4,4), 'cam2img' (4,4)}...],  # V views
    'ego2global': (4, 4),
    'sweeps': [{'images': [...], 'ego2global'}, ...],   # previous frames
    'annos': {'gt_boxes' (G, 7) vehicle/lidar frame, 'labels', 'names'},
  }

The TFRecord -> kitti_format conversion itself requires the
waymo-open-dataset package (absent in this image); `build_waymo_infos`
consumes the already-converted tree, matching the reference's two-stage
flow (tools/create_data.py waymo -> kitti_format -> infos).
"""

import os
import pickle

import numpy as np

__all__ = ['WaymoDataset', 'assemble_multiview_sample', 'WAYMO_CLASSES']

WAYMO_CLASSES = ('Car', 'Pedestrian', 'Cyclist')


def _pad44(m):
    out = np.eye(4)
    out[:np.asarray(m).shape[0], :np.asarray(m).shape[1]] = m
    return out


def assemble_multiview_sample(info,
                              data_root,
                              num_frames=1,
                              target_hw=(640, 960),
                              num_views=5,
                              max_gt=64,
                              normalize=True):
    """Build the (F, V, H, W, 3) image stack + (F, V, 4, 4) lidar2img.

    Previous frames' lidar2img are rewritten by ego-motion so all frames
    project from the CURRENT vehicle frame (reference
    loading.py:122-142): l2i_prev' = l2i_prev @ inv(prev_e2g) @ cur_e2g.
    Missing views/frames degrade to zero images with identity masks
    handled by the model's validity logic (zero features).
    """
    import cv2
    from .pipeline import IMG_MEAN, IMG_STD

    cur_e2g = _pad44(info.get('ego2global', np.eye(4)))
    frames = [dict(images=info['images'], ego2global=cur_e2g)]
    for sweep in info.get('sweeps', [])[:max(num_frames - 1, 0)]:
        frames.append(dict(images=sweep['images'],
                           ego2global=_pad44(sweep['ego2global'])))
    while len(frames) < num_frames:          # static-scene fallback
        frames.append(frames[-1])

    h_t, w_t = target_hw
    imgs = np.zeros((num_frames, num_views, h_t, w_t, 3), np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32),
                  (num_frames, num_views, 1, 1))
    for fi, frame in enumerate(frames):
        rel = np.linalg.inv(frame['ego2global']) @ cur_e2g
        for vi, cam in enumerate(frame['images'][:num_views]):
            path = os.path.join(data_root, cam['image_path'])
            img = cv2.imread(path)
            if img is None:
                continue
            # pad/crop heterogeneous view shapes to one static size
            # (reference loading.py:157-170 pads to the max shape)
            scale = min(h_t / img.shape[0], w_t / img.shape[1])
            nh, nw = int(img.shape[0] * scale), int(img.shape[1] * scale)
            img = cv2.resize(img, (nw, nh)).astype(np.float32)
            if normalize:
                img = (img - IMG_MEAN) / IMG_STD
            imgs[fi, vi, :nh, :nw] = img
            m = _pad44(np.asarray(cam['lidar2img'], np.float64))
            scale_m = np.diag([scale, scale, 1.0, 1.0])
            l2i[fi, vi] = (scale_m @ m @ rel).astype(np.float32)

    out = dict(imgs=imgs, lidar2img=l2i)
    annos = info.get('annos', {})
    g = min(len(annos.get('labels', [])), max_gt)
    gt = np.zeros((max_gt, 7), np.float32)
    gl = np.zeros((max_gt,), np.int64)
    gm = np.zeros((max_gt,), bool)
    if g:
        gt[:g] = np.asarray(annos['gt_boxes'], np.float32)[:g]
        gl[:g] = np.asarray(annos['labels'], np.int64)[:g]
        gm[:g] = True
    out.update(gt_boxes=gt, gt_labels=gl, gt_mask=gm)
    return out


class WaymoDataset:
    """Info-file-backed multi-view dataset.

    `load_mode` mirrors the reference's task switches
    (waymo_dataset.py:88-180):
      * 'lidar_frame' (default): one sample per frame, all views
        assembled (MV-DfM / CenterPoint-style);
      * 'cam_frame': the infos are EXPANDED 5x — one sample per
        camera, single-view images + that camera's lidar2img and the
        ground truths visible in it (PGD-Waymo multi-view mono);
      * 'cam_mono': like cam_frame but camera 0 only.
    `cam_sync=True` swaps the annotations for the camera-synchronized
    set (waymo_dataset.py:145-147; used by the cam_sync configs).
    """

    def __init__(self, data_root, info_path_or_list, num_frames=1,
                 target_hw=(640, 960), num_views=5, max_gt=64,
                 load_mode='lidar_frame', cam_sync=False):
        assert load_mode in ('lidar_frame', 'cam_frame', 'cam_mono')
        self.data_root = data_root
        if isinstance(info_path_or_list, str):
            with open(info_path_or_list, 'rb') as f:
                self.infos = pickle.load(f)
        else:
            self.infos = info_path_or_list
        if cam_sync:
            for info in self.infos:
                if 'cam_sync_annos' in info:
                    info['annos'] = info['cam_sync_annos']
        self.load_mode = load_mode
        self.num_frames = num_frames
        self.target_hw = target_hw
        self.num_views = num_views if load_mode == 'lidar_frame' else 1
        self.max_gt = max_gt
        # frame -> per-camera expansion (reference
        # convert_info_frame2img, waymo_dataset.py:117-138)
        if load_mode == 'cam_frame':
            self.cam_index = [(i, v) for i in range(len(self.infos))
                              for v in range(num_views)]
        elif load_mode == 'cam_mono':
            self.cam_index = [(i, 0) for i in range(len(self.infos))]
        else:
            self.cam_index = None

    def __len__(self):
        if self.cam_index is not None:
            return len(self.cam_index)
        return len(self.infos)

    def _cam_info(self, idx):
        """Single-camera view of a frame info: only that camera's
        image + projection, gts filtered to boxes whose centers
        project inside the image."""
        fi, vi = self.cam_index[idx]
        info = dict(self.infos[fi])
        cams = info.get('images', [])
        if vi < len(cams):
            info = dict(info, images=[cams[vi]])
        annos = dict(info.get('annos', {}))
        if annos.get('gt_boxes') is not None and vi < len(cams) and \
                len(np.asarray(annos['gt_boxes'])):
            boxes = np.asarray(annos['gt_boxes'], np.float32)
            l2i = _pad44(np.asarray(cams[vi]['lidar2img'], np.float64))
            ctr = np.concatenate(
                [boxes[:, :3], np.ones((len(boxes), 1))], axis=1)
            proj = ctr @ l2i.T
            z = proj[:, 2]
            uv = proj[:, :2] / np.maximum(z[:, None], 1e-5)
            h = cams[vi].get('height', self.target_hw[0])
            w = cams[vi].get('width', self.target_hw[1])
            vis = (z > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & \
                (uv[:, 1] >= 0) & (uv[:, 1] < h)
            annos['gt_boxes'] = boxes[vis]
            annos['labels'] = np.asarray(annos['labels'])[vis]
            info['annos'] = annos
        return info

    def get_sample(self, idx):
        if self.cam_index is not None:
            info = self._cam_info(idx)
            return assemble_multiview_sample(
                info, self.data_root, self.num_frames,
                self.target_hw, 1, self.max_gt)
        return assemble_multiview_sample(
            self.infos[idx], self.data_root, self.num_frames,
            self.target_hw, self.num_views, self.max_gt)

    def merge_multi_view_boxes(self, per_cam_results, nms_thr=0.05,
                               max_per_frame=100, score_thr=0.001):
        """Merge one frame's per-camera detections with a global
        rotated NMS (reference waymo_dataset.py:951-1000)."""
        import jax.numpy as jnp

        from ..core.nms import nms_bev
        boxes = np.concatenate(
            [np.asarray(r['boxes3d']).reshape(-1, 7)
             for r in per_cam_results], axis=0)
        scores = np.concatenate(
            [np.asarray(r['scores']).reshape(-1)
             for r in per_cam_results], axis=0)
        labels = np.concatenate(
            [np.asarray(r['labels']).reshape(-1)
             for r in per_cam_results], axis=0)
        valid = scores > score_thr
        scores = np.where(valid, scores, 0.0)
        keep = np.asarray(nms_bev(
            jnp.asarray(boxes[:, [0, 1, 3, 4, 6]]),
            jnp.asarray(np.where(valid, scores, -np.inf)), nms_thr))
        keep = keep & valid
        order = np.argsort(-np.where(keep, scores, -np.inf))
        sel = order[:max_per_frame]
        sel = sel[keep[sel]]
        return dict(boxes3d=boxes[sel], scores=scores[sel],
                    labels=labels[sel])

    # class index -> waymo type id (Car, Pedestrian, Cyclist)
    CLASS_TO_WAYMO_TYPE = (1, 2, 4)

    def format_results(self, results, out_bin):
        """Vehicle-frame detections -> Waymo Objects .bin.

        Replaces the reference's format_results -> KITTI2Waymo chain
        (waymo_dataset.py:405-514) without the KITTI detour: the MV
        model already predicts in the vehicle (lidar) frame.

        Args:
            results: list (per frame) of dicts with 'boxes_3d' (N, 7)
                bottom-center lidar boxes, 'labels_3d' (N,),
                'scores_3d' (N,).
            out_bin: output path.
        """
        from ..evaluation.waymo_proto import Box, ObjectPred, \
            encode_objects
        objs = []
        for info, res in zip(self.infos, results):
            ctx = info.get('context_name', '')
            ts = int(info.get('timestamp_micros', info.get('timestamp', 0)))
            boxes = np.asarray(res['boxes_3d']).reshape(-1, 7)
            labels = np.asarray(res['labels_3d']).astype(int)
            scores = np.asarray(res['scores_3d'])
            for b, lb, s in zip(boxes, labels, scores):
                if lb < 0 or lb >= len(self.CLASS_TO_WAYMO_TYPE):
                    continue
                objs.append(ObjectPred(
                    box=Box(center_x=float(b[0]), center_y=float(b[1]),
                            center_z=float(b[2] + b[5] / 2),
                            length=float(b[3]), width=float(b[4]),
                            height=float(b[5]), heading=float(b[6])),
                    type=self.CLASS_TO_WAYMO_TYPE[lb], score=float(s),
                    context_name=ctx, frame_timestamp_micros=ts))
        with open(out_bin, 'wb') as f:
            f.write(encode_objects(objs))
        return len(objs)

    def evaluate(self, results, gt_bin, work_dir='/tmp', binary=None):
        """Full eval: format -> .bin -> official binary or fallback.

        Mirrors WaymoDataset.evaluate (waymo_dataset.py:516-720); the
        returned ap_dict uses the reference's cam_sync (LET) key layout.
        """
        import os
        from ..evaluation.waymo_eval import evaluate_waymo
        pred_bin = os.path.join(work_dir, 'results_waymo.bin')
        self.format_results(results, pred_bin)
        return evaluate_waymo(pred_bin, gt_bin, binary=binary)
