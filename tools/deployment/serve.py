"""Minimal HTTP inference server — the TPU-native counterpart of the
reference's torchserve deployment (/root/reference/tools/deployment/
mmdet3d2torchserve.py + mmdet3d_handler.py): one process owns the
compiled model on the chip and answers POST /predictions with detected
boxes.

Protocol (mirrors the torchserve handler's contract):
    POST /predictions  body = raw float32 point bytes ([N, 4] lidar)
    -> {"boxes_3d": [[x, y, z, dx, dy, dz, yaw], ...],
        "scores_3d": [...], "labels_3d": [...]}
    GET /ping -> {"status": "ok"}   (torchserve health endpoint)

Usage:
    python tools/deployment/serve.py <config> <checkpoint_dir> \
        [--port 8080] [--score-thr 0.3]
"""
import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def build_handler(config, ckpt_dir, score_thr):
    """Load the model once, compile on first request, serve forever."""
    from gga_tpu.apis import inference_detector, init_model

    model_bundle = init_model(config, ckpt_dir)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/ping':
                self._json(200, {'status': 'ok'})
            else:
                self._json(404, {'error': 'unknown endpoint'})

        def do_POST(self):
            if self.path != '/predictions':
                self._json(404, {'error': 'unknown endpoint'})
                return
            n = int(self.headers.get('Content-Length', 0))
            pts = np.frombuffer(self.rfile.read(n),
                                np.float32).reshape(-1, 4)
            det = inference_detector(model_bundle, pts)
            keep = np.asarray(det['scores_3d']) >= score_thr
            self._json(200, {
                'boxes_3d': np.asarray(det['boxes_3d'])[keep].tolist(),
                'scores_3d': np.asarray(det['scores_3d'])[keep].tolist(),
                'labels_3d': np.asarray(det['labels_3d'])[keep].tolist(),
            })

        def log_message(self, fmt, *args):  # quiet access log
            pass

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    from gga_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()
    handler = build_handler(args.config, args.checkpoint, args.score_thr)
    server = HTTPServer(('0.0.0.0', args.port), handler)
    print(f'serving on :{args.port} (POST /predictions, GET /ping)')
    server.serve_forever()


if __name__ == '__main__':
    main()
