from ivlnce_tpu.trainers import trajectory_store
from ivlnce_tpu.trainers.base_trainer import BaseVLNCETrainer
from ivlnce_tpu.trainers.dagger_trainer import DaggerTrainer
from ivlnce_tpu.trainers.iterative_collection_dagger_trainer import (
    IterativeCollectionDaggerTrainer,
)
from ivlnce_tpu.trainers.iterative_dagger_trainer import IterativeDaggerTrainer

__all__ = [
    "trajectory_store",
    "BaseVLNCETrainer",
    "DaggerTrainer",
    "IterativeCollectionDaggerTrainer",
    "IterativeDaggerTrainer",
]
