"""LR policy parity with the reference formula (train_utils/lr.py:16-49)."""

import numpy as np

from caiman_asr_tpu.training.lr import lr_schedule


def ref_lr(step, initial_lr, min_lr, warmup, hold, half_life):
    if step < warmup:
        a = (step + 1) / (warmup + 1)
    elif step < warmup + hold:
        a = 1.0
    else:
        a = 0.5 ** ((step - warmup - hold) / half_life)
    return max(a * initial_lr, min_lr)


def test_lr_schedule_matches_reference():
    sched = lr_schedule(4e-3, 4e-4, warmup_steps=10, hold_steps=20, half_life_steps=15)
    for step in [0, 1, 5, 9, 10, 15, 29, 30, 31, 45, 60, 200]:
        expected = ref_lr(step, 4e-3, 4e-4, 10, 20, 15)
        got = float(sched(step))
        assert abs(got - expected) < 1e-9, (step, got, expected)


def test_lr_floor():
    sched = lr_schedule(1e-3, 5e-4, 2, 2, 1)
    assert abs(float(sched(1000)) - 5e-4) < 1e-9


def test_star_penalty_schedule_flags():
    """--star_penalty accepts a float OR "linear_schedule" driven by the
    star_* flags (reference args/star.py + train_utils/schedule.py): the
    WER threshold flips it to final_value, stickily."""
    from caiman_asr_tpu.args.train import train_arg_parser
    from caiman_asr_tpu.train import build_penalty_schedule

    args = train_arg_parser().parse_args(
        ["--star_penalty", "linear_schedule", "--star_wer_threshold", "0.2"]
    )
    sched = build_penalty_schedule(args, value_attr="star_penalty", prefix="star")
    assert sched.step(10, hints={"wer": 0.5}) == 0.75  # reference initial
    assert sched.step(11, hints={"wer": 0.1}) == 1.0   # flipped by WER
    assert sched.step(12, hints={"wer": 0.9}) == 1.0   # sticky

    args = train_arg_parser().parse_args(["--star_penalty", "0.3"])
    const = build_penalty_schedule(args, value_attr="star_penalty", prefix="star")
    assert const.step(0) == 0.3

    none = build_penalty_schedule(
        train_arg_parser().parse_args([]), value_attr="star_penalty",
        prefix="star",
    )
    assert none.step(0) == 0.0
