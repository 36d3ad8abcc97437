"""Optimizer + LR-schedule protos -> optax GradientTransformation.

[ref: second/pytorch/builder/optimizer_builder.py +
torchplus/train/learning_schedules_fast.py (OneCycle) — UNVERIFIED]
"""
from __future__ import annotations

import optax


def build_lr_schedule(lr_cfg, total_steps: int):
    which = lr_cfg.WhichOneof("learning_rate")
    if which == "constant_learning_rate":
        return optax.constant_schedule(lr_cfg.constant_learning_rate.learning_rate)
    if which == "exponential_decay_learning_rate":
        c = lr_cfg.exponential_decay_learning_rate
        return optax.exponential_decay(
            init_value=c.initial_learning_rate,
            transition_steps=int(c.decay_steps),
            decay_rate=c.decay_factor,
            staircase=c.staircase)
    if which == "manual_stepping_learning_rate":
        c = lr_cfg.manual_stepping_learning_rate
        boundaries = list(c.boundaries)
        rates = list(c.rates)
        return optax.piecewise_constant_schedule(
            init_value=rates[0],
            boundaries_and_scales={
                int(b): rates[i + 1] / rates[i]
                for i, b in enumerate(boundaries)})
    if which == "one_cycle":
        c = lr_cfg.one_cycle
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=c.lr_max,
            pct_start=c.pct_start or 0.3,
            div_factor=c.div_factor or 25.0,
            final_div_factor=1e4)
    # proto3 default: constant 2e-4 (lineage adam default)
    return optax.constant_schedule(2e-4)


def build(optimizer_cfg, total_steps: int) -> optax.GradientTransformation:
    which = optimizer_cfg.WhichOneof("optimizer")
    if which == "adam_optimizer" or which is None:
        c = optimizer_cfg.adam_optimizer
        schedule = build_lr_schedule(c.learning_rate, total_steps)
        wd = c.weight_decay
        if wd and optimizer_cfg.fixed_weight_decay:
            return optax.adamw(schedule, weight_decay=wd)
        tx = optax.adam(schedule)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx
    if which == "momentum_optimizer":
        c = optimizer_cfg.momentum_optimizer
        schedule = build_lr_schedule(c.learning_rate, total_steps)
        return optax.sgd(schedule, momentum=c.momentum_optimizer_value or 0.9)
    if which == "rms_prop_optimizer":
        c = optimizer_cfg.rms_prop_optimizer
        schedule = build_lr_schedule(c.learning_rate, total_steps)
        return optax.rmsprop(
            schedule, decay=c.decay or 0.9,
            momentum=c.momentum_optimizer_value or 0.9,
            eps=c.epsilon or 1e-8)
    raise ValueError(f"unknown optimizer {which}")
