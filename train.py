"""CLI entry point: python train.py --config_path configs/audio.yml

Reference: train.py:1-29 (arg parsing, env loading, distributed init,
trainer dispatch). The --nccl_timeout flag has no TPU analogue; multi-host
init is automatic on pods and configurable via --coordinator_address.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--coordinator_address", default=None,
                        help="multi-host coordinator (host:port); "
                             "auto-detected on TPU pods")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    args = parser.parse_args()

    # .env convention parity (reference: train.py:20) without a dotenv dep
    if os.path.exists(".env"):
        with open(".env") as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#") and "=" in line:
                    k, v = line.split("=", 1)
                    os.environ.setdefault(k.strip(), v.strip())

    from owl_audio_exps_tpu.configs import Config
    from owl_audio_exps_tpu.parallel import init_distributed
    from owl_audio_exps_tpu.trainers import get_trainer_cls

    init_distributed(args.coordinator_address, args.num_processes,
                     args.process_id)

    cfg = Config.from_yaml(args.config_path)
    trainer = get_trainer_cls(cfg.train.trainer_id)(cfg)
    trainer.train(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
