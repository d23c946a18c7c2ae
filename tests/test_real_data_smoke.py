"""Real-data readiness kit (tools/real_data_smoke.py): clean skip
semantics when the mounted artifacts are absent, and a full wire test
of the OSIE section on a synthesized "real layout" (fake
``fixations.mat`` + stimuli) driving preprocess -> trunk-less training
steps -> validation sweep -> test-driver artifact -> reference schema
diff (reference OSIE/test.py:130-146 record fields)."""

import json
from os.path import join

import numpy as np
import pytest
import scipy.io as sio

from scanpaths_tpu.data.preprocess import OSIE_TEST_IMAGES


def test_skips_cleanly_when_artifacts_absent(tmp_path):
    from tools.real_data_smoke import main

    out = tmp_path / "smoke.json"
    rc = main(["--root", str(tmp_path / "nothing"), "--out", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["all_skipped"] is True
    assert {r["task"] for r in rep["tasks"]} == {"osie", "air", "coco"}
    for r in rep["tasks"]:
        assert r["skipped"] is True and r["missing"]
    assert rep["trunk"]["skipped"] is True


def test_schema_constants_match_reference():
    """The expected prediction-record field sets are exactly the
    reference drivers' (AiR/test.py:157-165, OSIE/test.py:138-144,
    COCO_Search18/test.py:154-160)."""
    from tools.real_data_smoke import REFERENCE_PREDICT_SCHEMA as S

    assert S["osie"] == {"name", "repeat_id", "X", "Y", "T", "length"}
    assert S["air"] == {"img_names", "qid", "repeat_id", "performance",
                        "X", "Y", "T", "length"}
    assert S["coco"] == {"img_names", "task", "repeat_id",
                         "X", "Y", "T", "length"}


# ---- synthesized "real" OSIE layout (same .mat structure the
# reference preprocess reads, tests/test_preprocess.py fixtures) ----

def _track(x, y, t):
    arr = np.zeros((1, 1), dtype=[("x", "O"), ("y", "O"), ("t", "O")])
    arr[0, 0] = (np.asarray(x, float)[None, :],
                 np.asarray(y, float)[None, :],
                 np.asarray(t, float)[None, :])
    return arr


def _example(name, tracks):
    subjects = np.zeros((len(tracks), 1), dtype=object)
    for i, tr in enumerate(tracks):
        subjects[i, 0] = tr
    arr = np.zeros((1, 1), dtype=[("img", "O"), ("subjects", "O")])
    arr[0, 0] = (np.array([name]), subjects)
    return arr


@pytest.mark.slow
def test_osie_section_end_to_end(tmp_path):
    from PIL import Image

    from tools.real_data_smoke import main

    root = tmp_path / "real"
    (root / "osie" / "stimuli").mkdir(parents=True)
    rng = np.random.default_rng(0)
    # 9 trainval (8:1 split) + 2 fixed-test-list images, 4 subjects
    names = [f"{3000 + i}.jpg" for i in range(9)] + OSIE_TEST_IMAGES[:2]
    fx = np.zeros((len(names), 1), dtype=object)
    for i, name in enumerate(names):
        Image.fromarray(rng.integers(0, 255, (600, 800, 3),
                                     dtype=np.uint8)).save(
            str(root / "osie" / "stimuli" / name))
        tracks = []
        for _ in range(4):
            l = int(rng.integers(3, 7))
            tracks.append(_track(rng.uniform(0, 800, l),
                                 rng.uniform(0, 600, l),
                                 rng.uniform(150, 500, l)))
        fx[i, 0] = _example(name, tracks)
    sio.savemat(str(root / "osie" / "fixations.mat"), {"fixations": fx})

    out = tmp_path / "smoke.json"
    rc = main([
        "--root", str(root), "--task", "osie", "--steps", "2",
        "--batch", "4", "--eval_repeat_num", "1",
        "--device_eval", "false", "--workdir", str(tmp_path / "work"),
        "--out", str(out), "--backbone_layers", "1,1,1,1", "--embed",
        "128",
        # e2e test geometry (same compile-cache entries as test_e2e)
        "--", "--height", "40", "--width", "48", "--map_height", "5",
        "--map_width", "6", "--max_length", "4",
        "--rl_sample_number", "2", "--half_precision", "false",
    ])
    assert rc == 0
    rep = json.loads(out.read_text())
    (osie,) = rep["tasks"]
    assert not osie.get("skipped") and "error" not in osie, osie
    # preprocess really split: 8 train / 1 val / 2 test images x 4 subj
    assert osie["preprocess_records"] == {"train": 32, "validation": 4,
                                          "test": 8}
    assert osie["train_steps"] == 2
    assert np.isfinite(osie["loss_last"])
    assert np.isfinite(osie["validation_selection_metric"])
    assert osie["predict_artifact"] == "test_predicts.json"
    assert osie["predict_schema_ok"] is True
