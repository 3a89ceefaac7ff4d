"""Mixed labelled/unlabelled S3 loader.

Reference: owl_wms/data/s3_cod_latent_mixed.py: two prefixes feed two
queues; unlabelled items get zeroed controls and has_controls=False; per
item a bernoulli(unlabelled_frac) picks the source. Batches are
[vid, mouse, buttons, has_controls].
"""

from __future__ import annotations

import random
import time

import numpy as np

from .s3_cod_latent import S3CoDLoader


class S3CoDMixedLoader:
    def __init__(self, batch_size: int, bucket_name: str,
                 labelled_prefix: str, unlabelled_prefix: str,
                 window_length: int = 16, file_share_max: int = 50,
                 unlabelled_frac: float = 0.5, process_index: int = 0, **kw):
        self.batch_size = batch_size
        self.unlabelled_frac = unlabelled_frac
        self._rng = random.Random(777 + process_index)
        self.labelled = S3CoDLoader(
            1, bucket_name, labelled_prefix, window_length, file_share_max,
            process_index=process_index, **kw)
        self.unlabelled = S3CoDLoader(
            1, bucket_name, unlabelled_prefix, window_length, file_share_max,
            process_index=process_index + 10000, **kw)

    def sleep_until_queues_filled(self):
        while (self.labelled.queue.qsize() < self.batch_size or
               self.unlabelled.queue.qsize() < self.batch_size):
            time.sleep(0.5)

    def __iter__(self):
        while True:
            vids, mouses, btns, flags = [], [], [], []
            for _ in range(self.batch_size):
                if self._rng.random() < self.unlabelled_frac:
                    v, m, b = self.unlabelled.queue.get()
                    m = np.zeros_like(m)
                    b = np.zeros_like(b)
                    flags.append(False)
                else:
                    v, m, b = self.labelled.queue.get()
                    flags.append(True)
                vids.append(v)
                mouses.append(m)
                btns.append(b)
            yield [np.stack(vids).astype(np.float32),
                   np.stack(mouses).astype(np.float32),
                   np.stack(btns).astype(np.float32),
                   np.asarray(flags, dtype=bool)]


def get_loader(batch_size, bucket_name, labelled_prefix="labelled",
               unlabelled_prefix="unlabelled", window_length=16,
               unlabelled_frac=0.5, process_index: int = 0, **kw):
    return S3CoDMixedLoader(batch_size, bucket_name, labelled_prefix,
                            unlabelled_prefix, window_length,
                            unlabelled_frac=unlabelled_frac,
                            process_index=process_index, **kw)
