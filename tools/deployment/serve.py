#!/usr/bin/env python
"""Tiny HTTP model server over an exported artifact.

Equivalent of the reference's torchserve handler + `test_torchserver.py`
client loop (tools/deployment/mmdet3d_handler.py): loads the
`export_model.py` artifact and serves

    GET  /ping            -> {"status": "ok", ...meta}
    POST /predict         -> detections JSON

The POST body is an .npz archive whose arrays `arg0..argN` match
meta.json's input specs (for LiDAR detectors: arg0 = points
(1, N, 3) f32, arg1 = point mask (1, N) bool). Pure stdlib — no
torchserve, no flask.

Usage:
  python tools/deployment/serve.py ARTIFACT_DIR [--port 8080]
Client:
  import numpy as np, io, urllib.request
  buf = io.BytesIO(); np.savez(buf, arg0=pts, arg1=mask)
  req = urllib.request.Request('http://localhost:8080/predict',
                               buf.getvalue())
  print(urllib.request.urlopen(req).read())
"""

import argparse
import io
import json
import os
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def load_artifact(artifact_dir):
    from jax import export as jexport
    with open(os.path.join(artifact_dir, 'model.stablehlo'), 'rb') as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(artifact_dir, 'meta.json')) as f:
        meta = json.load(f)
    return exported, meta


def make_handler(exported, meta):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/ping':
                self._send(200, dict(status='ok', **meta))
            else:
                self._send(404, dict(error='unknown path'))

        def do_POST(self):
            if self.path != '/predict':
                self._send(404, dict(error='unknown path'))
                return
            try:
                n = int(self.headers.get('Content-Length', 0))
                z = np.load(io.BytesIO(self.rfile.read(n)))
                args = []
                for i, spec in enumerate(meta['inputs']):
                    a = np.asarray(z[f'arg{i}']).astype(spec['dtype'])
                    if list(a.shape) != spec['shape']:
                        raise ValueError(
                            f'arg{i}: shape {list(a.shape)} != '
                            f'{spec["shape"]}')
                    args.append(a)
                det = exported.call(*args)
                self._send(200, {k: np.asarray(v).tolist()
                                 for k, v in det.items()})
            except Exception as e:      # noqa: BLE001 — serve loop
                self._send(400, dict(error=str(e)))

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument('artifact_dir')
    p.add_argument('--port', type=int, default=8080)
    args = p.parse_args()
    exported, meta = load_artifact(args.artifact_dir)
    srv = HTTPServer(('127.0.0.1', args.port),
                     make_handler(exported, meta))
    print(f'serving {meta["detector_type"]} on '
          f'http://127.0.0.1:{args.port}  (/ping, /predict)')
    srv.serve_forever()


if __name__ == '__main__':
    main()
