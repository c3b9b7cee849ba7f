"""Shared runtime utilities (logger, seeding, meters).

Parity with the non-distributed parts of `pcdet/utils/common_utils.py`
(loggers :103, seeds :120-135, AverageMeter :280). The distributed helpers of
the reference (NCCL init, tmpdir result merge) have no equivalent here by
design — the mesh/sharding module (`pdm_ssd_tpu/parallel/mesh.py`) is the
entire communication layer.
"""
from __future__ import annotations

import logging
import random

import numpy as np


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(__name__ + f'.rank{rank}')
    logger.setLevel(log_level if rank == 0 else 'ERROR')
    formatter = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else 'ERROR')
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            file_handler = logging.FileHandler(filename=log_file)
            file_handler.setLevel(log_level if rank == 0 else 'ERROR')
            file_handler.setFormatter(formatter)
            logger.addHandler(file_handler)
    logger.propagate = False
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


class AverageMeter(object):
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
