#!/usr/bin/env python3
"""Re-run evaluation on a saved output dir (reference run_evaluation.py)."""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_path", type=str, required=True)
    args = p.parse_args()

    import os

    from eags_slam_tpu.config import load_config
    from eags_slam_tpu.datasets import get_dataset
    from eags_slam_tpu.evaluation.evaluator import Evaluator

    config = load_config(os.path.join(args.checkpoint_path, "config.yaml"))
    dataset = get_dataset(config["data"]["dataset_name"])(config)
    ev = Evaluator(args.checkpoint_path, dataset, config)
    print(ev.run())


if __name__ == "__main__":
    main()
