"""Multi-host plumbing tests (single-process environment).

True multi-process execution needs real multi-host hardware; these tests
cover everything testable here: the device-grid topology rules, the
per-process batch sharding of BatchLoader, and the no-op gating of
jax.distributed initialization.
"""

import dataclasses

import numpy as np
import pytest


@dataclasses.dataclass(frozen=True)
class FakeDev:
    id: int
    process_index: int


def _devs(per_host: int, hosts: int):
    return [FakeDev(h * per_host + i, h) for h in range(hosts)
            for i in range(per_host)]


class TestArrange2d:
    def test_seq_within_host(self):
        from video_moment_localization_tpu.parallel.mesh import arrange_2d

        grid = arrange_2d(_devs(4, 2), seq=4)
        assert grid.shape == (2, 4)
        # each seq row on one host; data axis spans hosts
        assert [d.process_index for d in grid[0]] == [0, 0, 0, 0]
        assert [d.process_index for d in grid[1]] == [1, 1, 1, 1]

    def test_seq_split_within_host(self):
        from video_moment_localization_tpu.parallel.mesh import arrange_2d

        grid = arrange_2d(_devs(4, 2), seq=2)
        assert grid.shape == (4, 2)
        for row in grid:
            assert len({d.process_index for d in row}) == 1

    def test_seq_spanning_hosts_rejected(self):
        from video_moment_localization_tpu.parallel.mesh import arrange_2d

        with pytest.raises(ValueError, match="span hosts"):
            arrange_2d(_devs(4, 2), seq=8)

    def test_indivisible_rejected(self):
        from video_moment_localization_tpu.parallel.mesh import arrange_2d

        with pytest.raises(ValueError, match="not divisible"):
            arrange_2d(_devs(4, 2), seq=3)


class TestInitializeDistributed:
    def test_noop_single_process(self, monkeypatch):
        from video_moment_localization_tpu.parallel.mesh import (
            initialize_distributed,
        )

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert initialize_distributed() is False


class TestShardedLoader:
    @pytest.fixture(scope="class")
    def dataset(self, tmp_path_factory):
        from video_moment_localization_tpu.data import CharadesSTA, WordEmbedding
        from video_moment_localization_tpu.data.synthetic import (
            write_charades_style_dir,
        )

        root = tmp_path_factory.mktemp("shard")
        data = write_charades_style_dir(str(root), num_videos=5,
                                        queries_per_video=2)
        emb = WordEmbedding.load(data + "/glove/glove.6B.300d.txt")
        return CharadesSTA(data, T=16, L=8, max_query_length=6,
                           split="train", embedding=emb)

    def test_shards_tile_the_global_batch(self, dataset):
        from video_moment_localization_tpu.data.pipeline import BatchLoader

        mk = lambda sid, ns: BatchLoader(  # noqa: E731
            dataset, batch_size=4, shuffle=True, num_workers=2, seed=7,
            shard_id=sid, num_shards=ns)
        full = list(mk(0, 1).epoch(3))
        s0 = list(mk(0, 2).epoch(3))
        s1 = list(mk(1, 2).epoch(3))
        assert len(full) == len(s0) == len(s1)
        for fb, b0, b1 in zip(full, s0, s1):
            for k in fb:
                if k == "sample_mask" or not isinstance(fb[k], np.ndarray):
                    continue
                merged = np.concatenate([b0[k], b1[k]], axis=0)
                np.testing.assert_array_equal(merged, fb[k], err_msg=k)
            np.testing.assert_array_equal(
                np.concatenate([b0["sample_mask"], b1["sample_mask"]]),
                fb["sample_mask"])

    def test_empty_tail_shard_is_masked(self, dataset):
        """10 samples, global batch 8 -> final global batch has 2 rows; the
        second shard (rows 4..7) gets none and must emit an all-masked
        batch of the right shape."""
        from video_moment_localization_tpu.data.pipeline import BatchLoader

        s1 = list(BatchLoader(dataset, batch_size=8, shuffle=False,
                              num_workers=2, seed=0, shard_id=1,
                              num_shards=2).epoch(0))
        assert len(s1) == 2
        last = s1[-1]
        assert last["sample_mask"].shape == (4,)
        assert last["sample_mask"].sum() == 0
        assert last["video_features"].shape[0] == 4

    def test_bad_shard_args(self, dataset):
        from video_moment_localization_tpu.data.pipeline import BatchLoader

        with pytest.raises(ValueError, match="divisible"):
            BatchLoader(dataset, batch_size=5, num_shards=2)
        with pytest.raises(ValueError, match="shard_id"):
            BatchLoader(dataset, batch_size=4, shard_id=2, num_shards=2)
