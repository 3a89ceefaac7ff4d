"""Pre-encode loader samples into warm-start buffers for the pipeline.

Reference: inference/build_cache.py:7-51 (100 samples -> data_cache/*.pt).
Saved as npz per sample index: history / audio / mouse / button.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--out_dir", default="data_cache")
    parser.add_argument("--n_samples", type=int, default=100)
    args = parser.parse_args()

    from owl_audio_exps_tpu.configs import Config
    from owl_audio_exps_tpu.data import get_loader

    cfg = Config.from_yaml(args.config_path)
    loader = iter(get_loader(cfg.train.data_id, 1,
                             **dict((cfg.train.data_kwargs or {}).items())))

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.n_samples):
        batch = next(loader)
        if len(batch) >= 4:
            vid, audio, mouse, btn = batch[:4]
        else:
            vid, mouse, btn = batch[:3]
            audio = np.zeros((vid.shape[0], vid.shape[1],
                              cfg.model.audio_channels), np.float32)
        np.savez(os.path.join(args.out_dir, f"buffers_{i}.npz"),
                 history=vid, audio=audio, mouse=mouse, button=btn)
    print(f"wrote {args.n_samples} warm-start buffers to {args.out_dir}")


if __name__ == "__main__":
    main()
