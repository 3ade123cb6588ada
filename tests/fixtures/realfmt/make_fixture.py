"""Build the committed real-format golden data fixture.

This writes a miniature data shard for each of the three datasets in the
EXACT on-disk layouts the reference consumes (reference dataset.py:189-315
and prepare_data.sh:1-32), so the readers' first contact with real file
formats is tested before real data ever arrives:

* ``charades/``      — per-video ``features/i3d_finetuned/{vid}.npy`` (one
  video stored as (nfeats, 1, 1024) to exercise the reference's
  ``.squeeze()``, one as (nfeats, 1024)), ``annotations/charades_sta_test.txt``
  lines ``"<vid> <s> <e>##<query>"`` and a ``Charades_v1_test.csv`` with the
  full real column set including quoted free-text fields that contain commas
  (the reference reads it with csv.DictReader, dataset.py:208-210).
* ``activitynet/``   — a single ``sub_activitynet_v1-3.c3d.hdf5`` with
  per-video groups holding a 500-d ``c3d_features`` dataset
  (dataset.py:274-275) + ``test.json`` {vid: {duration, timestamps,
  sentences}} including an out-of-range and an inverted span (the clamp/drop
  rules of dataset.py:258-260). One video is longer than T=128 so the
  strided eval sampler path runs at real dims.
* ``tacos/``         — ``tall_c3d_features.hdf5`` keyed by ``<vid>.avi``
  with 4096-d features (dataset.py:314-315) + ``test.json`` with
  frame-denominated timestamps and num_frames/fps (dataset.py:296-299).
* ``glove/``         — a GloVe-format ``glove.6B.300d.txt`` covering the
  fixture vocabulary (one query word is deliberately out-of-vocabulary to
  pin the <unk> path).

All array values follow the hand-checkable pattern
``value[r, c] = base + r + c / 1024`` (exactly representable in float32),
so tests can assert exact feature bytes through the partial-IO read paths.

HDF5 datasets are gzip-compressed to keep the committed fixture small;
h5py decompresses transparently so the read path is unchanged.

Run from the repo root:  python tests/fixtures/realfmt/make_fixture.py
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

# Fixture vocabulary. "zzzunknownword" is used in a query but deliberately
# NOT listed here — it must map to <unk> (zero vector, still mask-valid).
WORDS = [
    "a", "person", "opens", "the", "door", "closes", "window", "smiling",
    "mops", "floor", "this", "span", "is", "inverted", "and", "dropped",
]


def pattern(base: float, nfeats: int, dv: int) -> np.ndarray:
    r = np.arange(nfeats, dtype=np.float32)[:, None]
    c = np.arange(dv, dtype=np.float32)[None, :]
    return (base + r + c / 1024.0).astype(np.float32)


def write_glove() -> None:
    os.makedirs(os.path.join(HERE, "glove"), exist_ok=True)
    path = os.path.join(HERE, "glove", "glove.6B.300d.txt")
    with open(path, "w") as f:
        for i, w in enumerate(WORDS):
            vec = " ".join(f"{i + j * 0.001:.6f}" for j in range(300))
            f.write(f"{w} {vec}\n")


def write_charades() -> None:
    feat_dir = os.path.join(HERE, "charades", "features", "i3d_finetuned")
    ann_dir = os.path.join(HERE, "charades", "annotations")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    # GFIXA: (6, 1, 1024) — real LGI-style extra axis, squeezed by readers.
    np.save(os.path.join(feat_dir, "GFIXA.npy"),
            pattern(0.0, 6, 1024)[:, None, :])
    # GFIXB: (9, 1024) — squeeze() is a no-op.
    np.save(os.path.join(feat_dir, "GFIXB.npy"), pattern(100.0, 9, 1024))

    # Annotation lines in the exact real syntax "<vid> <s> <e>##<query>".
    # Line 2: epos 12.0 > duration 9.9  -> clamped to 9.9 (kept).
    # Line 3: inverted span             -> dropped.
    # Line 4: OOV first word            -> <unk> id, zero vector.
    lines = [
        "GFIXA 2.0 7.5##a person opens the door.",
        "GFIXB 0.0 12.0##person closes a window, smiling.",
        "GFIXB 5.0 3.0##this span is inverted and dropped.",
        "GFIXA 1.0 4.0##zzzunknownword mops the floor.",
    ]
    with open(os.path.join(ann_dir, "charades_sta_test.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # Full real Charades_v1 column set; the reader contracts only on
    # 'id' and 'length' (reference dataset.py:210) but must survive the
    # quoted free-text columns with embedded commas.
    with open(os.path.join(ann_dir, "Charades_v1_test.csv"), "w") as f:
        f.write("id,subject,scene,quality,relevance,verified,script,"
                "objects,descriptions,actions,length\n")
        f.write('GFIXA,XY12,Kitchen,6,7,Yes,'
                '"A person opens the door, then exits.",door;broom,'
                '"a person opens a door, they walk out",'
                'c092 0.00 6.90;c147 2.10 7.50,10.0\n')
        f.write('GFIXB,AB34,Living room,5,6,Yes,'
                '"Person closes a window, smiling.",window,'
                '"person closes a window, smiling",,9.9\n')


def write_activitynet() -> None:
    import h5py

    root = os.path.join(HERE, "activitynet")
    os.makedirs(root, exist_ok=True)
    with h5py.File(os.path.join(root, "sub_activitynet_v1-3.c3d.hdf5"), "w") as h5:
        h5.create_group("v_zfix001").create_dataset(
            "c3d_features", data=pattern(0.0, 7, 500), compression="gzip")
        # 150 > T=128: the strided eval sampler runs at real dims.
        h5.create_group("v_zfix002").create_dataset(
            "c3d_features", data=pattern(50.0, 150, 500), compression="gzip")

    anns = {
        "v_zfix001": {
            "duration": 14.56,
            # [-0.5, 10.0] -> spos clamped to 0; [5.0, 99.0] -> epos to 14.56.
            "timestamps": [[-0.5, 10.0], [5.0, 99.0]],
            "sentences": ["a person opens the door.",
                          "person closes a window."],
        },
        "v_zfix002": {
            "duration": 30.0,
            # [8.0, 3.0] inverted -> dropped.
            "timestamps": [[8.0, 3.0], [6.0, 24.0]],
            "sentences": ["this span is inverted and dropped.",
                          "a person mops the floor."],
        },
    }
    with open(os.path.join(root, "test.json"), "w") as f:
        json.dump(anns, f, indent=1)


def write_tacos() -> None:
    import h5py

    root = os.path.join(HERE, "tacos")
    os.makedirs(root, exist_ok=True)
    with h5py.File(os.path.join(root, "tall_c3d_features.hdf5"), "w") as h5:
        h5.create_dataset("s13-d21.avi", data=pattern(0.0, 5, 4096),
                          compression="gzip")
        h5.create_dataset("s27-d50.avi", data=pattern(10.0, 8, 4096),
                          compression="gzip")

    anns = {
        "s13-d21.avi": {
            "num_frames": 735, "fps": 29.4,
            # frames / fps: [147, 588] -> [5.0, 20.0] s; [600, 30] dropped.
            "timestamps": [[147, 588], [600, 30]],
            "sentences": ["the person opens a door.", "dropped inverted."],
        },
        "s27-d50.avi": {
            "num_frames": 1000, "fps": 25.0,
            "timestamps": [[0, 500]],
            "sentences": ["person mops the floor."],
        },
    }
    with open(os.path.join(root, "test.json"), "w") as f:
        json.dump(anns, f, indent=1)


if __name__ == "__main__":
    write_glove()
    write_charades()
    write_activitynet()
    write_tacos()
    print(f"fixture written under {HERE}")
