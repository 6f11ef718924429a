"""Standalone registration CLI.

The reference has no separate registration entry point — preprocessing runs
lazily inside the dataset constructor and is cached (SURVEY.md §3.5,
ref: src/dataset.py:67-88). This CLI runs (or forces) it explicitly:

  python scripts/run_registration.py --config configs/Replica/config_replica_room0.json [--force]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--force", action="store_true",
                    help="delete the cached inst_dict.pkl and re-run")
    args = ap.parse_args()

    from catnerf_tpu.config import Config
    from catnerf_tpu.data.replica import get_dataset
    from catnerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.from_json(args.config)
    cache = os.path.join(cfg.dataset_dir, "inst_dict.pkl")
    if args.force and os.path.exists(cache):
        os.remove(cache)
        print(f"removed {cache}")

    data = get_dataset(cfg)
    n_obj = sum(len(v) for k, v in data.inst_dict.items() if k != 0)
    print(f"registration complete: {len(data.inst_dict) - 1} categories, "
          f"{n_obj} object instances; cached at {cache}")


if __name__ == "__main__":
    main()
