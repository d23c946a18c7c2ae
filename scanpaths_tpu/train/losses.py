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
    # torch .std() is unbiased (ddof=1) — reference loss.py:52
    s = (s - s.mean(-1, keepdims=True)) \
        / (s.std(-1, keepdims=True, ddof=1) + EPSILON)
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


# -- AiR paper-ablation extras (reference AiR/models/loss.py:75-171;
#    imported by AiR/train.py:21-23 but never called — kept so ablation
#    studies against the reference remain reproducible).  The reference
#    versions use data-dependent boolean indexing / Python loops; these
#    are masked fixed-shape equivalents. ----------------------------------

def _per_sample_cc(a, b):
    a = a.reshape(a.shape[0], -1)
    b = b.reshape(b.shape[0], -1)
    a = a / (a.sum(-1, keepdims=True) + EPSILON)
    b = b / (b.sum(-1, keepdims=True) + EPSILON)
    a = a - a.mean(-1, keepdims=True)
    b = b - b.mean(-1, keepdims=True)
    cov = (a * b).sum(-1)
    return cov / (jnp.sqrt((a ** 2).sum(-1)) * jnp.sqrt((b ** 2).sum(-1))
                  + EPSILON)


def cc_terms(saliency, salmap, good_duration_masks, poor_duration_masks):
    """Per-sample CC restricted to samples where BOTH the good and poor
    streams produced fixations (reference ``CC_terms``,
    AiR/models/loss.py:75-103).  Returns (cc [N], paired_mask [N]) —
    the reference returns a ragged filtered vector; here the mask says
    which entries are real."""
    paired = ((good_duration_masks.sum(-1) > 0)
              & (poor_duration_masks.sum(-1) > 0)).astype(jnp.float32)
    return _per_sample_cc(saliency, salmap) * paired, paired


def cc_match_loss(gt_cc, pre_cc):
    """Mean absolute CC gap (reference ``CC_MatchLoss``, loss.py:104-106)."""
    return jnp.abs(gt_cc - pre_cc).mean()


def kld_items(saliency, salmap):
    """Per-sample (un-meaned) KLD vector (reference ``KLD_items``,
    loss.py:116-126)."""
    a = saliency.reshape(saliency.shape[0], -1)
    b = salmap.reshape(salmap.shape[0], -1)
    a = a / (a.sum(-1, keepdims=True) + EPSILON)
    b = b / (b.sum(-1, keepdims=True) + EPSILON)
    return (b * jnp.log(b / (a + EPSILON) + EPSILON)).sum(-1)


def kld_visual_linguistic_alignment(saliency, question_objects_pos,
                                    question_objects_masks,
                                    fullanswer_objects_pos,
                                    fullanswer_objects_masks):
    """KLD between the softmaxed saliency map and the binarized union of
    question + full-answer object regions (reference
    ``KLD_visual_linguistic_alignment``, loss.py:128-139).

    saliency: [N, H, W]; *_objects_pos: [N, H, W, K]; *_masks: [N, K].
    """
    n, h, w = saliency.shape[:3]
    gt = (question_objects_pos
          * question_objects_masks[:, None, None, :]).sum(-1) \
        + (fullanswer_objects_pos
           * fullanswer_objects_masks[:, None, None, :]).sum(-1)
    gt = (gt > 0).astype(jnp.float32)
    gt = gt / (gt.reshape(n, -1).sum(-1)[:, None, None] + EPSILON)
    sal = jax.nn.softmax(saliency.reshape(n, -1), -1).reshape(n, h, w)
    return kld(sal, gt)


def kld_question_aligment(saliency, question_objects_pos,
                          question_objects_masks, duration_masks):
    """For every (sample, question object): the minimum over valid
    timesteps of KLD(softmaxed step map || object map); mean over valid
    pairs (reference ``KLD_question_aligment``, loss.py:141-171 —
    the reference's per-sample Python loop with inf-masking becomes a
    fixed-shape [N, T, K] grid reduction).

    saliency: [N, T, H, W]; question_objects_pos: [N, H, W, K];
    question_objects_masks: [N, K]; duration_masks: [N, T].
    """
    n, t, h, w = saliency.shape
    k = question_objects_pos.shape[-1]
    sal = jax.nn.softmax(saliency.reshape(n * t, -1), -1)
    sal = sal.reshape(n, t, -1)
    obj = question_objects_pos.reshape(n, -1, k)
    obj = jnp.swapaxes(obj, 1, 2)                            # [N, K, HW]
    obj_n = obj / (obj.sum(-1, keepdims=True) + EPSILON)
    # kl[n, t, k] = sum_hw obj_n * log(obj_n / sal + eps)
    kl = jnp.einsum("nkh,ntkh->ntk", obj_n,
                    jnp.log(obj_n[:, None] / (sal[:, :, None] + EPSILON)
                            + EPSILON))
    kl = jnp.where(duration_masks[..., None] > 0, kl, jnp.inf)
    min_kl = kl.min(axis=1)                                  # [N, K]
    m = question_objects_masks
    return (jnp.where(m > 0, min_kl, 0.0).sum()
            / jnp.maximum(m.sum(), 1.0))
