"""Deployment packaging (tools/deployment/): export a detector to a
self-contained StableHLO artifact and serve it over the stdlib HTTP
server — the reference's torchserve handler + test_torchserver.py
round-trip, TPU-native (reference tools/deployment/mmdet3d_handler.py,
test_torchserver.py)."""

import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

TINY = dict(voxel_size=(3.6, 3.8, 0.5), nms_pre=64, max_num=8,
            point_cloud_range=(2, -30.4, -3, 59.6, 30.4, 1))


@pytest.fixture(scope='module')
def artifact(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from tools.deployment.export_model import export_artifact
    out = str(tmp_path_factory.mktemp('artifact'))
    meta = export_artifact('configs/hv_second_kitti_car.py', out,
                           cfg_overrides=TINY)
    return out, meta


def test_export_artifact_roundtrip(artifact):
    """Deserialize + call the artifact directly (no model code)."""
    out, meta = artifact
    from jax import export as jexport
    with open(os.path.join(out, 'model.stablehlo'), 'rb') as f:
        ex = jexport.deserialize(f.read())
    specs = meta['inputs']
    rng = np.random.RandomState(0)
    pts = (rng.rand(*specs[0]['shape']) * 60 - 30).astype('float32')
    mask = np.ones(specs[1]['shape'], bool)
    det = ex.call(pts, mask)
    det = {k: np.asarray(v) for k, v in det.items()}
    assert set(det) == set(meta['outputs'])
    assert np.isfinite(det['scores']).all()
    assert det['boxes3d'].shape[-1] == 7


def test_http_serve_roundtrip(artifact):
    """Start serve.py's handler in-process, POST an npz, get JSON."""
    out, meta = artifact
    from http.server import HTTPServer
    from tools.deployment.serve import load_artifact, make_handler
    exported, meta2 = load_artifact(out)
    srv = HTTPServer(('127.0.0.1', 0), make_handler(exported, meta2))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/ping') as r:
            ping = json.loads(r.read())
        assert ping['status'] == 'ok'
        specs = meta2['inputs']
        rng = np.random.RandomState(1)
        buf = io.BytesIO()
        np.savez(buf,
                 arg0=(rng.rand(*specs[0]['shape']) * 60 - 30
                       ).astype('float32'),
                 arg1=np.ones(specs[1]['shape'], bool))
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', buf.getvalue())
        with urllib.request.urlopen(req) as r:
            det = json.loads(r.read())
        assert set(det) == set(meta2['outputs'])
        scores = np.asarray(det['scores'])
        assert np.isfinite(scores).all()
        # bad-shape request -> clean 400, server stays up
        buf2 = io.BytesIO()
        np.savez(buf2, arg0=np.zeros((1, 3, 3), np.float32),
                 arg1=np.ones((1, 3), bool))
        req2 = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', buf2.getvalue())
        try:
            urllib.request.urlopen(req2)
            raise AssertionError('expected HTTP 400')
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


pytestmark = pytest.mark.slow
