"""Learning-rate schedule and optimizer.

The schedule multiplier follows the reference LambdaLR exactly
(reference OSIE/train.py:150-161): linear warmup over
``warmup_epoch`` supervised epochs, linear decay to zero until
``start_rl_epoch``, then a step down by ``rl_lr_initial_decay`` with a
linear decay over the RL epochs (measured in RL-loader steps).

The optimizer mirrors torch Adam semantics (reference
OSIE/train.py:111-112): gradient clipping by global norm FIRST
(clip_grad_norm_ before optimizer.step, train.py:185-187), then
L2-to-gradient weight decay (torch Adam's ``weight_decay`` adds
``wd * param`` to the gradient before the moment updates — unlike
AdamW), then Adam moments and the scheduled step size.
"""

from __future__ import annotations

import optax


def lr_multiplier(iteration, steps_sup: int, steps_rl: int,
                  warmup_epoch: int, start_rl_epoch: int, epochs: int,
                  rl_lr_initial_decay: float):
    """The reference lr_lambda as a jax-traceable function of the
    (0-based optimizer) step count."""
    import jax.numpy as jnp

    it = jnp.asarray(iteration, jnp.float32)
    warm_end = steps_sup * warmup_epoch
    sup_end = steps_sup * start_rl_epoch
    rl_total = steps_rl * max(epochs - start_rl_epoch, 1)
    warm = it / max(warm_end, 1)
    decay = 1.0 - (it - warm_end) / max(sup_end - warm_end, 1)
    rl = rl_lr_initial_decay * (1.0 - (it - sup_end) / rl_total)
    return jnp.where(it <= warm_end, warm,
                     jnp.where(it <= sup_end, decay, rl))


def make_optimizer(args, steps_sup: int, steps_rl: int):
    def schedule(count):
        return args.lr * lr_multiplier(
            count, steps_sup, steps_rl, args.warmup_epoch,
            args.start_rl_epoch, args.epoch, args.rl_lr_initial_decay)

    chain = []
    if args.clip > 0:
        chain.append(optax.clip_by_global_norm(args.clip))
    if args.weight_decay:
        chain.append(optax.add_decayed_weights(args.weight_decay))
    # --bf16_moments stores the first Adam moment in bfloat16 (optax
    # casts it back to f32 for the update math).  A memory probe, not a
    # parity knob: halves one of the two moment trees (~72 MB on the
    # full model) at a small accuracy cost to the moment accumulation —
    # off by default, measured in tools/bench_train.py.
    mu_dtype = "bfloat16" if getattr(args, "bf16_moments", False) else None
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                     mu_dtype=mu_dtype))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)
