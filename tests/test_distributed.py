"""REAL multi-process data parallelism: the docs/DISTRIBUTED.md pod
recipe executed across actual process boundaries (2 x
jax.distributed.initialize on the CPU backend, 4 virtual devices each),
through the real Trainer._device_batch -> make_array_from_process_local
_data -> jitted step path.  Complements tests/test_mesh.py, whose
process_count overrides only ever simulate multi-host inside one
interpreter.  Reference being surpassed: single-process nn.DataParallel
(reference AiR/train.py:169-170)."""

import numpy as np
import pytest

from tools.dist_smoke import launch


@pytest.mark.slow
def test_two_process_pod_matches_single_process(tmp_path):
    r = launch(str(tmp_path), num_processes=2, steps=2)
    assert len(r["multi"]) == 2
    for host_losses in r["multi"]:
        # every host sees the same replicated loss scalars, equal to
        # the single-process run up to cross-process all-reduce
        # summation order (float32 ulp)
        np.testing.assert_allclose(host_losses, r["single"], rtol=1e-6)
