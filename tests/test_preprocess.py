"""Offline preprocessors on synthesized raw inputs: record schema and
split semantics vs the reference scripts
(reference OSIE/preprocess/preprocess_fixations.py:7-38,
AiR/preprocess/preprocess_fixations.py:27-64)."""

import json
import os
from os.path import join

import numpy as np
import pytest
import scipy.io as sio

from scanpaths_tpu.data.preprocess import (OSIE_TEST_IMAGES, preprocess_air,
                                           preprocess_osie)


def _track(x, y, t):
    arr = np.zeros((1, 1), dtype=[("x", "O"), ("y", "O"), ("t", "O")])
    arr[0, 0] = (np.asarray(x, float)[None, :], np.asarray(y, float)[None, :],
                 np.asarray(t, float)[None, :])
    return arr


def _example(name, tracks):
    subjects = np.zeros((len(tracks), 1), dtype=object)
    for i, tr in enumerate(tracks):
        subjects[i, 0] = tr
    arr = np.zeros((1, 1), dtype=[("img", "O"), ("subjects", "O")])
    arr[0, 0] = (np.array([name]), subjects)
    return arr


def test_preprocess_osie(tmp_path):
    rng = np.random.default_rng(0)
    # 18 trainval images + 2 from the fixed test list, 3 subjects each
    names = [f"{2000 + i}.jpg" for i in range(18)] + OSIE_TEST_IMAGES[:2]
    fx = np.zeros((len(names), 1), dtype=object)
    for i, name in enumerate(names):
        tracks = []
        for _ in range(3):
            l = int(rng.integers(2, 7))
            tracks.append(_track(rng.uniform(0, 800, l),
                                 rng.uniform(0, 600, l),
                                 rng.uniform(100, 500, l)))
        fx[i, 0] = _example(name, tracks)
    mat = tmp_path / "fixations.mat"
    sio.savemat(str(mat), {"fixations": fx})

    out = tmp_path / "fixations_out"
    preprocess_osie(str(mat), str(out))

    recs = {}
    for split in ("train", "validation", "test"):
        with open(out / f"osie_fixations_{split}.json") as f:
            recs[split] = json.load(f)
    # split sizes: 18 trainval -> 16 train / 2 val (8:9 cut), test = the
    # 2 fixed-list images; 3 subjects each
    train_names = {r["name"] for r in recs["train"]}
    val_names = {r["name"] for r in recs["validation"]}
    test_names = {r["name"] for r in recs["test"]}
    assert len(train_names) == 16 and len(val_names) == 2
    assert test_names == set(OSIE_TEST_IMAGES[:2])
    assert not (train_names & val_names)
    # schema matches the reference record exactly
    r = recs["train"][0]
    assert set(r) == {"name", "subject", "X", "Y", "T", "length", "split"}
    assert r["length"] == len(r["X"]) == len(r["Y"]) == len(r["T"])
    assert r["split"] == "train"
    assert isinstance(r["subject"], int) and r["subject"] >= 1
    # all 3 subjects present per image
    per_image = {}
    for rec in recs["train"]:
        per_image.setdefault(rec["name"], set()).add(rec["subject"])
    assert all(v == {1, 2, 3} for v in per_image.values())
    # determinism: the split is pinned by np.random.seed(0)
    out2 = tmp_path / "fixations_out2"
    preprocess_osie(str(mat), str(out2))
    with open(out2 / "osie_fixations_train.json") as f:
        assert {x["name"] for x in json.load(f)} == train_names


def test_preprocess_air(tmp_path):
    rng = np.random.default_rng(1)
    n_q, n_subj = 10, 3
    qids = [f"q{i:04d}" for i in range(n_q)]
    subjects = [f"subj{j}" for j in range(n_subj)]

    questions = {q: {"imageId": f"im{i}", "question": f"what {i}?",
                     "answer": "yes", "fullAnswer": f"Yes it is {i}."}
                 for i, q in enumerate(qids)}
    consolidated = {"accuracy": {q: float(rng.uniform()) for q in qids},
                    "question": {q: questions[q]["question"] for q in qids},
                    "answer": {q: "yes" for q in qids}}
    for s in subjects:
        consolidated[s] = {q: ("yes" if rng.uniform() < 0.5 else "no")
                           for q in qids}
    graphs = {f"im{i}": {"objects": {"o1": {"name": "cat",
                                            "x": 1, "y": 2, "w": 3, "h": 4}}}
              for i in range(n_q)}

    qjson = tmp_path / "val_balanced_questions.json"
    cjson = tmp_path / "consolidated_answers.json"
    gjson = tmp_path / "val_sceneGraphs.json"
    qjson.write_text(json.dumps(questions))
    cjson.write_text(json.dumps(consolidated))
    gjson.write_text(json.dumps(graphs))

    fix_root = tmp_path / "fix"
    empty_qid = qids[3]
    for q in qids:
        os.makedirs(fix_root / q)
        for j, s in enumerate(subjects):
            if q == empty_qid and j == 1:
                xy = np.zeros((0, 2))      # empty track -> reference break
                t = np.zeros((0, 2))
            else:
                l = int(rng.integers(2, 8))
                xy = rng.uniform(0, 400, (l, 2))
                t = np.cumsum(rng.uniform(50, 300, (l, 2)), axis=1)
            sio.savemat(str(fix_root / q / f"{s}.mat"), {"xy": xy, "t": t})

    out = tmp_path / "air_out"
    preprocess_air(str(cjson), str(qjson), str(gjson), str(fix_root),
                   gqa_images_dir="unused", out_dir=str(out),
                   image_size_fn=lambda p: (480, 640))

    all_recs = []
    for split in ("train", "validation", "test"):
        with open(out / f"AiR_fixations_{split}.json") as f:
            recs = json.load(f)
        for r in recs:
            assert r["split"] == split
        all_recs.extend(recs)
    # 80/10/10 over 10 qids -> 8/1/1 question split; the question with
    # the empty track may contribute zero records (break can hit before
    # any subject lands, depending on os.listdir order)
    by_split = {s: {r["question_id"] for r in all_recs if r["split"] == s}
                for s in ("train", "validation", "test")}
    missing = set(qids) - set().union(*by_split.values())
    assert missing <= {empty_qid}
    assert sum(len(v) for v in by_split.values()) >= 9
    # the empty-track subject aborts the REMAINING subjects of its
    # question (reference preprocess break): os.listdir order decides
    # how many land before the break, never all three
    n_empty = sum(r["question_id"] == empty_qid for r in all_recs)
    assert n_empty < n_subj
    # schema: GQA question fields + fixation fields + provenance
    r = next(rec for rec in all_recs if rec["question_id"] != empty_qid)
    for key in ("imageId", "question", "answer", "fullAnswer", "image_id",
                "subject", "question_id", "height", "width", "X", "Y",
                "T_start", "T_end", "length", "subject_answer", "accuracy",
                "split", "objects"):
        assert key in r, key
    assert r["height"] == 480 and r["width"] == 640
    assert r["length"] == len(r["X"]) == len(r["T_start"])
    assert r["image_id"].endswith(".jpg")
    assert r["subject_answer"] in ("yes", "no")
    assert r["objects"] == graphs[r["imageId"]]["objects"]
    # T_end > T_start elementwise
    assert all(e > s for s, e in zip(r["T_start"], r["T_end"]))


def test_preprocess_cli(tmp_path):
    """The preprocess CLI drives the OSIE path end-to-end."""
    rng = np.random.default_rng(2)
    names = [f"{3000 + i}.jpg" for i in range(9)] + [OSIE_TEST_IMAGES[0]]
    fx = np.zeros((len(names), 1), dtype=object)
    for i, name in enumerate(names):
        l = int(rng.integers(2, 5))
        fx[i, 0] = _example(name, [_track(rng.uniform(0, 800, l),
                                          rng.uniform(0, 600, l),
                                          rng.uniform(100, 400, l))])
    mat = tmp_path / "fixations.mat"
    sio.savemat(str(mat), {"fixations": fx})

    from scanpaths_tpu.cli.preprocess import main
    out = tmp_path / "out"
    main(["osie", "--fixations_mat", str(mat), "--out_dir", str(out)])
    for split in ("train", "validation", "test"):
        assert (out / f"osie_fixations_{split}.json").exists()
