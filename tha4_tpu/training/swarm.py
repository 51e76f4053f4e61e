"""Swarm training: independent models trained side by side, no gradient sync.

Reference: src/tha4/shion/core/training/swarm/swarm_unit_trainer.py:332-344 —
torchrun used purely as a process launcher; each rank trains its OWN model
from a rank->trainer-factory dict (embarrassingly parallel multi-job).

TPU equivalents provided here:
  * multi-process: each JAX process picks its unit by process index
    (the direct analogue of rank->trainer);
  * single process: run the units sequentially (one-chip job arrays).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import jax

from tha4_tpu.training.trainer import Trainer

logger = logging.getLogger(__name__)


class SwarmTrainer:
    def __init__(self, unit_trainer_factories: Dict[int, Callable[[], Trainer]]):
        self.unit_trainer_factories = dict(unit_trainer_factories)

    def train_unit(self, unit: int, target_examples: Optional[int] = None):
        factory = self.unit_trainer_factories[unit]
        logger.info("Swarm unit %d starting", unit)
        return factory().train(target_examples)

    def train_process_unit(self, target_examples: Optional[int] = None):
        """Each process trains the unit matching its process index
        (reference: rank -> trainer, swarm_unit_trainer.py:332-344)."""
        unit = jax.process_index()
        if unit not in self.unit_trainer_factories:
            logger.info("Process %d has no swarm unit; idle", unit)
            return None
        return self.train_unit(unit, target_examples)

    def train_all(self, target_examples: Optional[int] = None) -> Dict[int, object]:
        """Single-process fallback: run every unit sequentially."""
        return {
            unit: self.train_unit(unit, target_examples)
            for unit in sorted(self.unit_trainer_factories)
        }
