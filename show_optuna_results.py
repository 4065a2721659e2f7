#!/usr/bin/env python
"""Print the hyperparameter study report (reference show_optuna_results.py).

Works with both a real Optuna SQLite study (when optuna is installed) and
this framework's built-in ministudy storage."""

import argparse

from gan_aug_pfa_tpu.tune import STORAGE, STUDY_NAME, display_study_results


def main() -> None:
    p = argparse.ArgumentParser(description="Show tuning study results")
    p.add_argument("--storage", type=str, default=STORAGE)
    p.add_argument("--study-name", type=str, default=STUDY_NAME)
    args = p.parse_args()
    display_study_results(storage=args.storage, study_name=args.study_name)


if __name__ == "__main__":
    main()
