"""Generate golden metric fixtures by EXECUTING the read-only reference
implementation at /root/reference (no reference code is copied into this
repo; this script only records its input/output behaviour as JSON test
fixtures).

Run once:  python tools/gen_goldens.py
Outputs:   tests/fixtures/scanmatch_goldens.json
           tests/fixtures/vame_goldens.json
"""

import json
import sys
from pathlib import Path

import numpy as np
import scipy.io as sio

REF = Path("/root/reference/OSIE/utils/evaltools")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

sys.path.insert(0, str(REF))
import scanmatch as ref_scanmatch  # noqa: E402
import visual_attention_metrics as ref_vame  # noqa: E402


def mat_data():
    mc = sio.loadmat(str(REF / "ScanMatch_DataExample.mat"))
    return [mc["data1"], mc["data2"], mc["data3"]]


def random_scanpaths(rng, n, res=(320, 240), max_len=18, min_len=1,
                     dur_range=(30.0, 900.0)):
    out = []
    for _ in range(n):
        l = int(rng.integers(min_len, max_len + 1))
        x = rng.uniform(0, res[0], l)
        y = rng.uniform(0, res[1], l)
        t = rng.uniform(*dur_range, l)
        out.append(np.stack([x, y, t], axis=1))
    return out


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)

    # --- ScanMatch goldens -------------------------------------------------
    cases = []
    data = mat_data()
    configs = [
        dict(Xres=1024, Yres=768, Xbin=12, Ybin=8, Offset=(0, 0), TempBin=100, Threshold=3.5),
        dict(Xres=1024, Yres=768, Xbin=12, Ybin=8, Offset=(0, 0), Threshold=3.5),
        dict(Xres=320, Yres=240, Xbin=16, Ybin=12, Offset=(0, 0), TempBin=50, Threshold=3.5),
        dict(Xres=320, Yres=240, Xbin=16, Ybin=12, Offset=(0, 0), Threshold=3.5),
    ]
    # .mat demo pairs on original resolution
    for cfg in configs[:2]:
        sm = ref_scanmatch.ScanMatch(**cfg)
        for i in range(3):
            for j in range(3):
                a = sm.fixationToSequence(data[i]).astype(np.int32)
                b = sm.fixationToSequence(data[j]).astype(np.int32)
                score, _, _ = sm.match(a, b)
                cases.append(dict(cfg=cfg, fix1=data[i].tolist(), fix2=data[j].tolist(),
                                  seq1=a.tolist(), seq2=b.tolist(), score=float(score)))
    # random pairs on framework resolution (both configs)
    paths = random_scanpaths(rng, 24)
    for cfg in configs[2:]:
        sm = ref_scanmatch.ScanMatch(**cfg)
        for k in range(0, 24, 2):
            f1, f2 = paths[k], paths[k + 1]
            a = sm.fixationToSequence(f1).astype(np.int32)
            b = sm.fixationToSequence(f2).astype(np.int32)
            score, _, _ = sm.match(a, b)
            cases.append(dict(cfg=cfg, fix1=f1.tolist(), fix2=f2.tolist(),
                              seq1=a.tolist(), seq2=b.tolist(), score=float(score)))
    # edge cases: out-of-bounds coords, tiny paths, nonzero gap
    edge = [
        (np.array([[0.0, 0.0, 40.0]]), np.array([[319.9, 239.9, 600.0]])),
        (np.array([[400.0, 300.0, 120.0], [10.0, 10.0, 80.0]]),
         np.array([[-5.0, -5.0, 55.0], [160.0, 120.0, 75.0], [100.0, 200.0, 20.0]])),
    ]
    for f1, f2 in edge:
        for cfg in configs[2:] + [dict(Xres=320, Yres=240, Xbin=16, Ybin=12,
                                       Offset=(0, 0), Threshold=3.5, GapValue=-0.5)]:
            sm = ref_scanmatch.ScanMatch(**cfg)
            a = sm.fixationToSequence(f1).astype(np.int32)
            b = sm.fixationToSequence(f2).astype(np.int32)
            score, _, _ = sm.match(a, b)
            cases.append(dict(cfg=cfg, fix1=f1.tolist(), fix2=f2.tolist(),
                              seq1=a.tolist(), seq2=b.tolist(), score=float(score)))
    with open(OUT / "scanmatch_goldens.json", "w") as f:
        json.dump(cases, f)
    print(f"scanmatch: {len(cases)} cases")

    # --- VAME goldens ------------------------------------------------------
    vcases = []
    stim_240 = np.zeros((240, 320, 3), np.float32)
    stim_768 = np.zeros((768, 1024, 3), np.float32)
    pairs = [(data[0], data[1], stim_768), (data[0], data[2], stim_768),
             (data[1], data[2], stim_768)]
    vpaths = random_scanpaths(rng, 20)
    pairs += [(vpaths[k], vpaths[k + 1], stim_240) for k in range(0, 20, 2)]
    for f1, f2, stim in pairs:
        sed = ref_vame.string_edit_distance(stim, np.array(f1), np.array(f2))
        stde = ref_vame.scaled_time_delay_embedding_similarity(
            np.array(f1, dtype=np.float64), np.array(f2, dtype=np.float64), stim)
        vcases.append(dict(fix1=np.array(f1).tolist(), fix2=np.array(f2).tolist(),
                           shape=list(stim.shape[:2]), sed=int(sed), stde=float(stde)))
    with open(OUT / "vame_goldens.json", "w") as f:
        json.dump(vcases, f)
    print(f"vame: {len(vcases)} cases")


if __name__ == "__main__":
    main()
