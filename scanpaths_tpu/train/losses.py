"""Loss functions and saliency measures (JAX).

Pure-function ports of the reference loss layer (reference
OSIE/models/loss.py and the AiR extras in AiR/models/loss.py), with the
reference's normalization quirks preserved:

* every mask-normalized loss divides by the GLOBAL mask sum over the
  whole batch (loss.py:13,31,36,44), not per-sample counts;
* CrossEntropyLoss applies its own softmax to raw logits (loss.py:12).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPSILON = 1e-7


def cross_entropy_loss(logits, gt, mask):
    """Soft-target CE.  logits [N,T,A] raw, gt [N,T,A], mask [N,T]."""
    p = jax.nn.softmax(logits, axis=-1)
    loss = -(gt * jnp.log(p + EPSILON) * mask[..., None]).sum() / mask.sum()
    return loss


def duration_smooth_l1_loss(pred, gt, mask):
    """Reference DurationSmoothL1Loss (loss.py:16-19): huber(beta=1) on
    mask-multiplied values, summed, over global mask sum."""
    x = pred * mask - gt * mask
    ax = jnp.abs(x)
    huber = jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)
    return huber.sum() / mask.sum()


def mlp_log_normal_distribution(mu, sigma2, gt, mask):
    """LogNormal NLL of ground-truth durations (loss.py:27-32)."""
    logpdf = jnp.log(1.0 / (gt + EPSILON)
                     / jnp.sqrt(2 * math.pi * sigma2)) \
        + (-(jnp.log(gt + EPSILON) - mu) ** 2 / (2 * sigma2))
    return -(logpdf * mask).sum() / mask.sum()


def mlp_rayleigh_distribution(sigma2, gt, mask):
    """Alternative Rayleigh duration NLL (loss.py:21-25; parsed but
    unused by the reference drivers — kept for API completeness)."""
    logpdf = jnp.log(gt / sigma2 + EPSILON) + (-(gt ** 2) / (2 * sigma2))
    return -(logpdf * mask).sum() / mask.sum()


def log_action(selected_probs, mask):
    """Per-sample REINFORCE action log-prob, normalized by the global
    mask sum (loss.py:34-37).  Returns [N]."""
    return (jnp.log(selected_probs + EPSILON) * mask).sum(-1) / mask.sum()


def log_duration(durations, mu, sigma2, mask):
    """Per-sample REINFORCE duration log-prob (loss.py:39-45).  [N]."""
    items = jnp.log(1.0 / (durations + EPSILON)
                    / jnp.sqrt(2 * math.pi * sigma2)) \
        + (-(jnp.log(durations + EPSILON) - mu) ** 2 / (2 * sigma2))
    return (items * mask).sum(-1) / mask.sum()


# -- saliency measures (imported by the reference drivers; kept for
#    parity even though they do not enter the training losses) ----------

def nss(saliency, fixation):
    s = saliency.reshape(saliency.shape[0], -1)
    f = fixation.reshape(fixation.shape[0], -1)
    s = s / (s.max(-1, keepdims=True) + EPSILON)
    s = (s - s.mean(-1, keepdims=True)) / (s.std(-1, keepdims=True) + EPSILON)
    return ((s * f).sum(-1) / (f.sum(-1) + EPSILON)).mean()


def cc(saliency, salmap):
    a = saliency.reshape(saliency.shape[0], -1)
    b = salmap.reshape(salmap.shape[0], -1)
    a = a / (a.sum(-1, keepdims=True) + EPSILON)
    b = b / (b.sum(-1, keepdims=True) + EPSILON)
    a = a - a.mean(-1, keepdims=True)
    b = b - b.mean(-1, keepdims=True)
    cov = (a * b).sum(-1)
    return (cov / (jnp.sqrt((a ** 2).sum(-1)) * jnp.sqrt((b ** 2).sum(-1))
                   + EPSILON)).mean()


def kld(saliency, salmap):
    a = saliency.reshape(saliency.shape[0], -1)
    b = salmap.reshape(salmap.shape[0], -1)
    a = a / (a.sum(-1, keepdims=True) + EPSILON)
    b = b / (b.sum(-1, keepdims=True) + EPSILON)
    return (b * jnp.log(b / (a + EPSILON) + EPSILON)).sum(-1).mean()
