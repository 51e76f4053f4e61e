"""Learning-rate and loss-weight schedules keyed on *examples seen*.

"Examples seen" (not steps) is the global progress unit everywhere in the
reference (SURVEY.md section 5); schedules are host-side functions evaluated
per step and fed to the jitted train step as scalar arguments, so phase
changes never trigger recompilation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple


@dataclass(frozen=True)
class TrainingPhase:
    """reference: src/tha4/nn/siren/morpher/siren_morpher_03_trainer.py:65-73."""

    num_examples_upper_bound: int
    learning_rate: float
    loss_weights: Dict[str, float] = field(default_factory=dict)


class TrainingPhases:
    """Piecewise-constant schedule over examples-seen
    (reference siren_morpher_03_trainer.py:76-124)."""

    def __init__(self, phases: Sequence[TrainingPhase]):
        assert len(phases) > 0
        for i in range(1, len(phases)):
            assert phases[i - 1].num_examples_upper_bound < phases[i].num_examples_upper_bound
        self.phases = list(phases)

    @property
    def total_examples(self) -> int:
        return self.phases[-1].num_examples_upper_bound

    def _phase_at(self, examples_seen: int) -> TrainingPhase:
        for phase in self.phases[:-1]:
            if examples_seen < phase.num_examples_upper_bound:
                return phase
        return self.phases[-1]

    def learning_rate(self, examples_seen: int) -> float:
        return self._phase_at(examples_seen).learning_rate

    def loss_weight(self, term: str, examples_seen: int) -> float:
        return self._phase_at(examples_seen).loss_weights.get(term, 0.0)

    def loss_weights(self, terms: Sequence[str], examples_seen: int) -> Dict[str, float]:
        phase = self._phase_at(examples_seen)
        return {t: phase.loss_weights.get(t, 0.0) for t in terms}


def step_lr_schedule(base_lr: float, boundaries: Sequence[int], divisors: Sequence[float]):
    """The face student's lr ladder: base / divisor_i after boundary_i
    (reference siren_face_morpher_00_trainer.py:134-150: /3, /10, /30 at
    200k/500k/800k)."""
    assert len(boundaries) == len(divisors)

    def lr(examples_seen: int) -> float:
        rate = base_lr
        for b, d in zip(boundaries, divisors):
            if examples_seen >= b:
                rate = base_lr / d
        return rate

    return lr
