"""The l15 synthetic-adapter base-projection cache (__spark_entry__.py):
eviction must unpersist the orphaned bases but EXEMPT the current one —
the era frames memoized in the same call read through it, and the round-10
review found the first eviction draft unpersisting its own base."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402


def _base_key(spark, sf_dir):
    from hbsir_old_spark.sources.cache import object_token

    return (object_token(spark), sf_dir, "__l15_base__")


def test_warm_base_materializes_the_cached_projection(spark, sf_dir):
    entry_mod._L15_FRAME_CACHE.clear()
    entry_mod._l15_warm_base(spark, sf_dir)
    base = entry_mod._L15_FRAME_CACHE.get(_base_key(spark, sf_dir))
    assert base is not None
    assert base.storageLevel.useMemory, "base projection not persisted"
    # materialized: the RDD reports cached partitions without a new job
    assert base.rdd.getNumPartitions() >= 1


def test_eviction_unpersists_orphans_but_exempts_current_base(spark, sf_dir):
    cache = entry_mod._L15_FRAME_CACHE
    cache.clear()
    # a stale base from a "previous" input dir, persisted
    stale = spark.range(10).cache()
    stale.count()
    from hbsir_old_spark.sources.cache import object_token

    cache[(object_token(spark), "/some/old/dir", "__l15_base__")] = stale
    # overflow the cache so the next load_years call triggers eviction
    for i in range(70):
        cache[("filler", i)] = None
    loader = entry_mod._l15_raw_loader(spark, sf_dir)
    frames = loader.load_years("food", list(range(1363, 1402)))
    assert frames, "no era frames returned"
    # the stale base was unpersisted; the fillers are gone
    assert not stale.storageLevel.useMemory
    assert ("filler", 0) not in cache
    # the CURRENT base survived eviction, still persisted, and the era
    # frames still compute (they read through it)
    base = cache.get(_base_key(spark, sf_dir))
    assert base is not None and base.storageLevel.useMemory
    _, first = frames[0]
    assert first.limit(1).count() >= 0
    cache.clear()
