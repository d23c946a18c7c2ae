"""scanpaths_tpu — a TPU-native framework for human scanpath prediction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Scanpaths
reference (CVPR 2021, "Predicting Human Scanpaths in Visual Question
Answering"): one codebase with three task plugins (AiR visual question
answering, OSIE free viewing, COCO-Search18 visual search) instead of the
reference's three copy-paste directories.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  core/     grid geometry, fixation structs, layered config
  data/     JSON fixation datasets -> packed device arrays; on-disk
            packed image cache; host->device prefetch
  models/   dilated ResNet-50 + ConvLSTM decoder as one lax.scan program
  ops/      device sampler (batched stochastic + greedy decode),
            Pallas TPU NW-alignment kernel (pallas_nw)
  metrics/  ScanMatch / MultiMatch / SED / STDE — host oracles + batched JAX
            kernels + the evaluation sweeps and artifact dumpers
  train/    supervised + SCST steps (reward in-graph), pjit data parallel
  utils/    checkpoint triad (msgpack), run records, logging
  cli/      train/test/predict/preprocess entry points (train/test
            mirror the reference flags; predict serves arbitrary
            images)
"""

__version__ = "0.1.0"
