"""Input-pipeline benchmark (the reference's dataset.py __main__ analog,
reference dataset.py:317-349): iterate one full train epoch per dataset,
assert batch shapes, print sample counts and wall time.

With real data dirs present (see scripts/prepare_data.sh) it benchmarks all
three datasets; otherwise it falls back to a synthetic on-disk Charades-style
dir so the harness always runs.

Usage: python scripts/bench_data.py [--data_root data] [--batch_size 64]
       [--num_workers 4]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_moment_localization_tpu.data.datasets import (  # noqa: E402
    ActivityNet,
    CharadesSTA,
    TACoS,
)
from video_moment_localization_tpu.data.glove import WordEmbedding  # noqa: E402
from video_moment_localization_tpu.data.pipeline import BatchLoader  # noqa: E402


def bench(name, dataset, batch_size, num_workers):
    loader = BatchLoader(dataset, batch_size, shuffle=True,
                         num_workers=num_workers, seed=0)
    t0 = time.time()
    count = 0
    for batch in loader.epoch(0):
        assert batch["video_features"].shape[1] == dataset.T
        assert batch["query_features"].shape[1] == dataset.max_query_length
        count += int(batch["sample_mask"].sum())
    dt = time.time() - t0
    print(f"# of training samples in {name}: {count}")
    print(f"Total elapsed time ({dt:.5f}sec)  [{count / max(dt, 1e-9):.0f} samples/s]")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", default="data")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_workers", type=int, default=4)
    args = parser.parse_args()

    specs = [
        ("CharadesSTA", CharadesSTA, os.path.join(args.data_root, "charades"),
         dict(T=64, L=16, max_query_length=13)),
        ("ActivityNet", ActivityNet, os.path.join(args.data_root, "activitynet"),
         dict(T=128, L=64, max_query_length=20)),
        ("TACoS", TACoS, os.path.join(args.data_root, "tacos"),
         dict(T=128, L=32, max_query_length=14)),
    ]

    any_real = False
    glove = None
    for name, cls, data_dir, kw in specs:
        probe = (os.path.join(data_dir, "annotations") if cls is CharadesSTA
                 else os.path.join(data_dir, "train.json"))
        if not os.path.exists(probe):
            print(f"{name}: no data at {data_dir}, skipping")
            continue
        glove = glove or WordEmbedding.load()
        bench(name, cls(data_dir, split="train", embedding=glove, **kw),
              args.batch_size, args.num_workers)
        any_real = True

    if not any_real:
        print("No real datasets found — benchmarking a synthetic Charades-style dir.")
        from video_moment_localization_tpu.data.synthetic import write_charades_style_dir

        with tempfile.TemporaryDirectory() as tmp:
            root = write_charades_style_dir(tmp, num_videos=64, queries_per_video=4)
            emb = WordEmbedding.load(os.path.join(root, "glove/glove.6B.300d.txt"))
            ds = CharadesSTA(root, T=64, L=16, max_query_length=13,
                             split="train", embedding=emb)
            bench("CharadesSTA(synthetic)", ds, args.batch_size, args.num_workers)


if __name__ == "__main__":
    main()
