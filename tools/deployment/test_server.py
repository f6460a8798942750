"""Client smoke test for tools/deployment/serve.py (counterpart of
/root/reference/tools/deployment/test_torchserver.py).

Usage:
    python tools/deployment/test_server.py demo/data/kitti/xxx.bin \
        [--url http://127.0.0.1:8080]
"""
import argparse
import json
import urllib.request


def main():
    p = argparse.ArgumentParser()
    p.add_argument('bin_file')
    p.add_argument('--url', default='http://127.0.0.1:8080')
    args = p.parse_args()

    with urllib.request.urlopen(args.url + '/ping') as r:
        print('ping:', r.read().decode())

    with open(args.bin_file, 'rb') as f:
        body = f.read()
    req = urllib.request.Request(
        args.url + '/predictions', data=body,
        headers={'Content-Type': 'application/octet-stream'})
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    print(f'{len(out["boxes_3d"])} detections')
    for b, s, l in zip(out['boxes_3d'], out['scores_3d'],
                       out['labels_3d']):
        print(f'  label={l} score={s:.3f} box={[round(x, 2) for x in b]}')


if __name__ == '__main__':
    main()
