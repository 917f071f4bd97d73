import numpy as np
import pytest

from europarl_crawler_ray.functions.canonical import hash_urls
from europarl_crawler_ray.state.seen import BloomSet


def test_check_and_add_basic():
    b = BloomSet(m_bits=1 << 16, exact=True)
    h1, h2 = hash_urls(["u1", "u2", "u3"])
    assert b.check_and_add(h1, h2).tolist() == [False, False, False]
    assert b.check_and_add(h1, h2).tolist() == [True, True, True]
    assert b.n_added == 3


def test_intra_batch_duplicates_only_first_is_new():
    b = BloomSet(m_bits=1 << 16, exact=True)
    h1, h2 = hash_urls(["a", "b", "a", "a", "c", "b"])
    seen = b.check_and_add(h1, h2)
    assert seen.tolist() == [False, False, True, True, False, True]
    assert b.n_added == 3


def test_bloom_mode_no_false_negatives_and_dup_detection():
    b = BloomSet(m_bits=1 << 20, exact=False)
    urls = [f"https://h/{i}" for i in range(5000)]
    h1, h2 = hash_urls(urls)
    first = b.check_and_add(h1, h2)
    # duplicates within batch flagged, no false negatives on re-check
    assert not first[np.unique(h1, return_index=True)[1]].any()
    again = b.check_and_add(h1, h2)
    assert again.all()


def test_bloom_fpr_reasonable():
    b = BloomSet(m_bits=1 << 20, k=8, exact=False)  # ~10 bits/key at 100k keys
    h1, h2 = hash_urls([f"k{i}" for i in range(100_000)])
    b.check_and_add(h1, h2)
    q1, q2 = hash_urls([f"other{i}" for i in range(50_000)])
    fpr = b.contains(q1, q2).mean()
    assert fpr < 0.02, fpr


def test_checkpoint_restore(tmp_path):
    b = BloomSet(m_bits=1 << 16, exact=True)
    h1, h2 = hash_urls(["x", "y"])
    b.check_and_add(h1, h2)
    p = str(tmp_path / "shard.npz")
    b.save(p)
    b2 = BloomSet.load(p)
    assert b2.check_and_add(*hash_urls(["x", "y", "z"])).tolist() == [True, True, False]


def test_sharded_seenset_routing(ray_session):
    from europarl_crawler_ray.state.seen import SeenSet

    s = SeenSet(num_shards=4, m_bits_per_shard=1 << 16, exact=True)
    urls = [f"https://h/{i}" for i in range(1000)] * 2
    h1, h2 = hash_urls(urls)
    seen = s.check_and_add(h1, h2)
    # first 1000 unique: exactly 1000 new regardless of shard routing
    assert int((~seen).sum()) == 1000
    assert s.contains_mask(h1, h2).all()
    assert s.stats()["n_added"] == 1000


def test_shard_death_without_checkpoint_dir_fails_loudly(ray_session):
    import numpy as np
    import pytest
    import ray

    from europarl_crawler_ray.state.seen import SeenSet

    s = SeenSet(num_shards=2, m_bits_per_shard=1 << 16)
    h = np.arange(100, dtype=np.uint64)
    s.check_and_add(h, h + 1)
    ray.kill(s.shards[0], no_restart=True)
    with pytest.raises(RuntimeError, match="checkpoint_dir"):
        for _ in range(5):  # death may surface on a later call
            s.check_and_add(h, h + 1)
    for a in s.shards:
        ray.kill(a, no_restart=True)


def test_shard_death_with_checkpoint_recovers_at_least_once(ray_session, tmp_path):
    """VERDICT r2 #10: a killed SeenShard restarts, reloads its last
    checkpoint, and serves again. Urls seen BEFORE the checkpoint stay
    seen; urls seen after it may be re-admitted once (documented
    at-least-once)."""
    import time

    import numpy as np
    import ray

    from europarl_crawler_ray.state.seen import SeenSet

    ckpt = str(tmp_path / "seen")
    s = SeenSet(num_shards=2, m_bits_per_shard=1 << 16, checkpoint_dir=ckpt)
    pre = np.arange(0, 200, dtype=np.uint64)
    assert not s.check_and_add(pre, pre + 1).any()
    s.checkpoint()
    post = np.arange(1000, 1100, dtype=np.uint64)
    assert not s.check_and_add(post, post + 1).any()  # after the checkpoint

    for a in s.shards:
        ray.kill(a, no_restart=False)  # crash every shard
    time.sleep(0.5)

    # checkpointed urls are still seen after the restart+reload
    seen_pre = s.check_and_add(pre, pre + 1)
    assert seen_pre.all(), "checkpointed urls were forgotten by restarted shards"
    # post-checkpoint urls were forgotten -> re-admitted once (documented)
    seen_post = s.check_and_add(post, post + 1)
    assert not seen_post.any()
    # ...and from now on they are seen again
    assert s.check_and_add(post, post + 1).all()
    for a in s.shards:
        ray.kill(a, no_restart=True)
