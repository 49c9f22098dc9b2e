"""Training-time parameter schedules.

Host-side (Python) schedules that feed scalar values into the jitted train
step each iteration, matching the reference semantics:

- ``ConstantSchedule`` / ``StepSchedule`` — used for the delay-penalty and
  star-penalty loss modifiers; StepSchedule flips from an initial to a final
  value at a toggle step OR once dev WER drops below a threshold
  (training/caiman_asr_train/train_utils/schedule.py:35-117).
- ``GradNoiseSchedule`` — std of Gaussian noise added to encoder gradients:
  ``noise_level / (1 + step - start_step) ** decay_const``
  (train_utils/grad_noise_scheduler.py:48-126). The noise itself is applied
  inside the jitted step (training/step.py) with a jax PRNG; this class only
  computes the std scalar.
- ``MelNormRamp`` — the blended mel-normalization ratio ramp: 0 (pure
  utterance stats) -> 1 (pure dataset stats) linearly over
  [ramp_start_step, ramp_end_step] (data/dali/mel_normalization.py:78-141,
  stepped from the train loop, reference train.py:153,183).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional


class ConstantSchedule:
    def __init__(self, value: float):
        self._value = float(value)

    def step(self, train_step: int, *, hints: Optional[Dict[str, Any]] = None) -> float:
        return self._value

    def value(self) -> float:
        return self._value


class StepSchedule:
    """Jump from initial_value to final_value at toggle_step or when
    hints["wer"] < wer_threshold; sticky once triggered."""

    def __init__(
        self,
        initial_value: float,
        final_value: float = 1.0,
        toggle_step: Optional[int] = None,
        wer_threshold: Optional[float] = None,
    ):
        if toggle_step is None and wer_threshold is None:
            raise ValueError("StepSchedule needs a toggle_step or a wer_threshold")
        self.initial_value = initial_value
        self.final_value = final_value
        self.toggle_step = toggle_step
        self.wer_threshold = wer_threshold
        self.set = False

    def step(self, train_step: int, *, hints: Optional[Dict[str, Any]] = None) -> float:
        if not self.set:
            if (
                self.wer_threshold is not None
                and hints is not None
                and hints.get("wer") is not None
                and hints["wer"] < self.wer_threshold
            ):
                self.set = True
            if self.toggle_step is not None and train_step >= self.toggle_step:
                self.set = True
        return self.value()

    def value(self) -> float:
        return self.final_value if self.set else self.initial_value


def build_schedule(
    constant: Optional[float] = None,
    initial_value: Optional[float] = None,
    final_value: float = 1.0,
    toggle_step: Optional[int] = None,
    wer_threshold: Optional[float] = None,
):
    """Mirror of the reference's delay/star penalty schedule builders
    (setup/train.py:212-229)."""
    if constant is not None:
        return ConstantSchedule(constant)
    return StepSchedule(initial_value or 0.0, final_value, toggle_step, wer_threshold)


@dataclass
class GradNoiseSchedule:
    """std(step) = noise_level / (1 + step - start_step) ** decay_const."""

    noise_level: float = 0.15
    decay_const: float = 0.55
    start_step: int = 1

    def __post_init__(self):
        assert self.noise_level > 0
        assert self.decay_const >= 0
        assert self.start_step >= 1

    def std(self, step: int) -> float:
        if step < self.start_step:
            return 0.0
        return self.noise_level / (1 + step - self.start_step) ** self.decay_const


@dataclass
class MelNormRamp:
    """Linear utterance->dataset stats blend ratio over a step window.

    ``start_ratio`` is the pre-ramp dataset_to_utt_ratio (reference
    ``--norm_starting_ratio``, args/mel_feat_norm.py:19-26): the blend
    ramps linearly from start_ratio to 1.0 across the window."""

    ramp_start_step: int
    ramp_end_step: int
    start_ratio: float = 0.0

    def ratio(self, step: int) -> float:
        if step <= self.ramp_start_step:
            return self.start_ratio
        if step >= self.ramp_end_step:
            return 1.0
        frac = (step - self.ramp_start_step) / (
            self.ramp_end_step - self.ramp_start_step
        )
        return self.start_ratio + (1.0 - self.start_ratio) * frac

    def complete(self, step: int) -> bool:
        return step >= self.ramp_end_step
