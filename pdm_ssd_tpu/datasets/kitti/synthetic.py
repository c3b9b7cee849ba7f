"""Synthetic mini-KITTI fabricator.

Builds a tiny, fully self-consistent KITTI-format dataset (velodyne bins,
label_2 txt in camera frame, calib, png headers) for end-to-end pipeline
tests and CLI verification without the real KITTI download. Planted boxes
are exactly recoverable, so a short training run must reach recall ~1.0.
"""
from __future__ import annotations

import struct

import numpy as np

P2 = np.array([[700., 0., 600., 0.],
               [0., 700., 180., 0.],
               [0., 0., 1., 0.]], np.float32)
R0 = np.eye(3, dtype=np.float32)
V2C = np.array([[0., -1., 0., 0.],
                [0., 0., -1., 0.],
                [1., 0., 0., 0.]], np.float32)


def write_calib(path):
    lines = [
        'P0: ' + ' '.join(map(str, P2.reshape(-1))),
        'P1: ' + ' '.join(map(str, P2.reshape(-1))),
        'P2: ' + ' '.join(map(str, P2.reshape(-1))),
        'P3: ' + ' '.join(map(str, P2.reshape(-1))),
        'R0_rect: ' + ' '.join(map(str, R0.reshape(-1))),
        'Tr_velo_to_cam: ' + ' '.join(map(str, V2C.reshape(-1))),
        'Tr_imu_to_velo: ' + ' '.join(map(str, V2C.reshape(-1))),
    ]
    path.write_text('\n'.join(lines) + '\n')


def write_png_header(path, w=1242, h=375, seed=None):
    """A real decodable PNG (gray gradient + seeded texture) so the image
    pipeline (CaDDN, GT-sampler image copy-paste) can run on the mini set;
    falls back to a bare IHDR header stub if PIL is unavailable."""
    try:
        from PIL import Image
        rng = np.random.RandomState(0 if seed is None else seed)
        rows = np.linspace(60, 140, h, dtype=np.float32)[:, None, None]
        img = rows + rng.randint(0, 40, (h, w, 3)).astype(np.float32)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            str(path), optimize=True)
    except ImportError:
        sig = b'\x89PNG\r\n\x1a\n'
        ihdr_data = struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0)
        ihdr = struct.pack('>I', 13) + b'IHDR' + ihdr_data + b'\x00' * 4
        path.write_bytes(sig + ihdr)


def lidar_box_to_label(box, cls='Car'):
    """lidar (x,y,z_center,dx,dy,dz,heading) -> KITTI label line."""
    from pdm_ssd_tpu.datasets.kitti.calibration import Calibration
    from pdm_ssd_tpu.datasets.kitti import kitti_utils
    calib = Calibration({'P2': P2, 'P3': P2, 'R0': R0, 'Tr_velo2cam': V2C})
    cam = kitti_utils.boxes3d_lidar_to_kitti_camera(box[None, :7], calib)[0]
    bbox = kitti_utils.boxes3d_kitti_camera_to_imageboxes(
        cam[None], calib, image_shape=(375, 1242))[0]
    x, y, z, l, h, w, ry = cam
    alpha = -np.arctan2(-box[1], box[0]) + ry
    return (f'{cls} 0.00 0 {alpha:.2f} {bbox[0]:.2f} {bbox[1]:.2f} '
            f'{bbox[2]:.2f} {bbox[3]:.2f} {h:.2f} {w:.2f} {l:.2f} '
            f'{x:.2f} {y:.2f} {z:.2f} {ry:.2f}')


def make_mini_kitti(root, n_frames=3, seed=0, n_bg=2000):
    rng = np.random.RandomState(seed)
    (root / 'ImageSets').mkdir(parents=True)
    for sub in ['velodyne', 'label_2', 'calib', 'image_2']:
        (root / 'training' / sub).mkdir(parents=True)
    ids = [f'{i:06d}' for i in range(n_frames)]
    (root / 'ImageSets/train.txt').write_text('\n'.join(ids) + '\n')
    (root / 'ImageSets/val.txt').write_text('\n'.join(ids) + '\n')

    for fid in ids:
        boxes = []
        for _ in range(3):
            x = rng.uniform(8, 40)
            y = np.clip(rng.uniform(-0.5, 0.5) * x * 0.5, -15, 15)
            boxes.append([x, y, -0.8, 3.9, 1.6, 1.56, rng.uniform(-1.5, 1.5)])
        boxes = np.array(boxes, np.float32)
        # background points in FOV + points inside each box
        bg_x = rng.uniform(3, 60, n_bg)
        bg = np.stack([bg_x, bg_x * rng.uniform(-0.4, 0.4, n_bg),
                       rng.uniform(-1.6, 0.5, n_bg), rng.rand(n_bg)], 1)
        obj_pts = []
        for b in boxes:
            local = rng.uniform(-0.5, 0.5, (200, 3)) * b[3:6] * 0.9
            c, s = np.cos(b[6]), np.sin(b[6])
            gx = local[:, 0] * c - local[:, 1] * s + b[0]
            gy = local[:, 0] * s + local[:, 1] * c + b[1]
            gz = local[:, 2] + b[2]
            obj_pts.append(np.stack([gx, gy, gz, rng.rand(200)], 1))
        pts = np.concatenate([bg] + obj_pts).astype(np.float32)
        pts.tofile(str(root / 'training/velodyne' / f'{fid}.bin'))
        labels = [lidar_box_to_label(b) for b in boxes]
        (root / 'training/label_2' / f'{fid}.txt').write_text('\n'.join(labels) + '\n')
        write_calib(root / 'training/calib' / f'{fid}.txt')
        write_png_header(root / "training/image_2" / f"{fid}.png", seed=int(fid))


