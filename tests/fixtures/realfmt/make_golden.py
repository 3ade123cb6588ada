"""Capture golden per-sample arrays by running the REFERENCE dataset code
over the committed real-format fixture.

This is the strongest possible format-parity oracle: the golden.npz values
come from ``/root/reference/dataset.py`` itself (CharadesSTA, ActivityNet,
TACoS — dataset.py:189-315), executed on the exact fixture files in this
directory, with the torchtext shim supplying the fixture GloVe table. Our
readers must reproduce every array bit-for-bit (floats) / value-for-value
(bools) in tests/test_golden_realformat.py.

Requires the reference checkout at /root/reference (present in the build
environment; golden.npz is committed so the test itself never imports it).

Run from the repo root:  python tests/fixtures/realfmt/make_golden.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(os.path.dirname(HERE)))
REF = "/root/reference"

os.environ["VML_GLOVE_TXT"] = os.path.join(HERE, "glove", "glove.6B.300d.txt")
sys.path.insert(0, os.path.join(REPO, "scripts"))
import torchtext_shim  # noqa: F401  (registers the fake torchtext)

sys.path.insert(0, REF)
import dataset as ref_dataset  # the reference's dataset.py

# Keys whose golden values we store per sample (reference __getitem__
# layout, dataset.py:160-185; leading singleton batch dim stripped).
ARRAY_KEYS = [
    "video_features", "video_mask", "query_features", "query_mask",
    "length_mask", "moment_mask", "sm", "ym", "ss", "ys", "se", "ye", "ya",
]
SCALAR_KEYS = ["start_pos", "end_pos", "start_index", "end_index", "duration"]


def capture(name, ds):
    out = {f"{name}/len": np.int64(len(ds))}
    for i in range(len(ds)):
        s = ds[i]
        for k in ARRAY_KEYS:
            v = s[k]
            arr = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            if arr.ndim > 0 and arr.shape[0] == 1 and k != "start_pos":
                arr = arr[0]
            out[f"{name}/{i}/{k}"] = arr
        out[f"{name}/{i}/start_pos"] = np.float64(float(s["start_pos"]))
        out[f"{name}/{i}/end_pos"] = np.float64(float(s["end_pos"]))
        out[f"{name}/{i}/start_index"] = np.int64(s["start_index"])
        out[f"{name}/{i}/end_index"] = np.int64(s["end_index"])
        out[f"{name}/{i}/duration"] = np.float64(s["duration"])
        out[f"{name}/{i}/times"] = np.asarray(s["times"], dtype=np.float64)
        out[f"{name}/{i}/video_id"] = np.str_(s["video_id"])
    return out


def main():
    golden = {}
    golden.update(capture("charades", ref_dataset.CharadesSTA(
        data_dir=os.path.join(HERE, "charades"), split="test")))
    golden.update(capture("activitynet", ref_dataset.ActivityNet(
        data_dir=os.path.join(HERE, "activitynet"), split="test")))
    golden.update(capture("tacos", ref_dataset.TACoS(
        data_dir=os.path.join(HERE, "tacos"), split="test")))
    out = os.path.join(HERE, "golden.npz")
    np.savez_compressed(out, **golden)
    print(f"wrote {out} ({os.path.getsize(out) / 1024:.0f} KiB, "
          f"{len(golden)} entries)")


if __name__ == "__main__":
    main()
