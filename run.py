#!/usr/bin/env python3
"""IVLN-CE TPU framework entry point.

Preserves the reference CLI surface (reference run.py:17-77):

    python run.py --run-type {train,eval,inference} --exp-config <yaml> \
        [opt.key value ...]
"""

import argparse
import random

import numpy as np

from ivlnce_tpu.utils.jax_setup import setup_jax

setup_jax()

import ivlnce_tpu.envs.env  # noqa: F401  (registers envs/datasets/sensors)
import ivlnce_tpu.mapping.obs_transforms  # noqa: F401
import ivlnce_tpu.models  # noqa: F401  (registers policies)
import ivlnce_tpu.tasks  # noqa: F401
import ivlnce_tpu.trainers  # noqa: F401  (registers trainers)
from ivlnce_tpu.config import get_config
from ivlnce_tpu.utils import logging_util
from ivlnce_tpu.utils.registry import registry

logger = logging_util.logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--run-type",
        choices=["train", "eval", "inference"],
        required=True,
        help="run type of the experiment (train, eval, inference)",
    )
    parser.add_argument(
        "--exp-config",
        type=str,
        required=True,
        help="path to config yaml containing info about experiment",
    )
    parser.add_argument(
        "opts",
        default=None,
        nargs=argparse.REMAINDER,
        help="Modify config options from command line",
    )
    args = parser.parse_args()
    run_exp(**vars(args))


def run_exp(exp_config: str, run_type: str, opts=None) -> None:
    config = get_config(exp_config, opts)
    logger.info(f"config: {config.dump()}")
    logging_util.add_filehandler(config.LOG_FILE)

    random.seed(config.TASK_CONFIG.SEED)
    np.random.seed(config.TASK_CONFIG.SEED)

    trainer_cls = registry.get_trainer(config.TRAINER_NAME)
    assert trainer_cls is not None, f"{config.TRAINER_NAME} is not supported"
    trainer = trainer_cls(config)

    if run_type == "train":
        trainer.train()
    elif run_type == "eval":
        trainer.eval()
    elif run_type == "inference":
        trainer.inference()


if __name__ == "__main__":
    main()
