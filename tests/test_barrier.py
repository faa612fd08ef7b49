"""barrier.pin: the package-wide materialization barrier.

Modes (``spark.sparkocr.pin``): ``auto`` picks a RELIABLE checkpoint
when ``sc.setCheckpointDir`` is configured (the 100 TB posture — pinned
subplans survive executor loss) and an executor-local checkpoint
otherwise (the sandbox/test default); ``local``/``reliable`` force one
form. Every pin call site in the package flows through this helper, so
exercising each physical form here covers the whole family's storage
contract.

Each test restores the checkpoint dir and the pin confs it touches
(``_pin_env``), so the suite is order-independent.
"""

import warnings

import pytest
from pyspark.sql import functions as F

from sparkocr import barrier
from sparkocr.barrier import pin
from sparkocr.engine import with_rank


@pytest.fixture
def _pin_env(spark):
    """Snapshot + restore the session state pin reads: the checkpoint
    dir and the ``spark.sparkocr.pin`` / ``.pin.cache`` confs."""
    sc = spark.sparkContext
    prev_dir = sc.getCheckpointDir()
    yield sc
    sc.setCheckpointDir(prev_dir)
    spark.conf.unset("spark.sparkocr.pin")
    spark.conf.unset("spark.sparkocr.pin.cache")


def _ckpt_files(ckpt_dir):
    return [p for p in ckpt_dir.rglob("*") if p.is_file()]


def test_pin_without_dir_is_local(spark, _pin_env):
    _pin_env.setCheckpointDir(None)
    out = pin(spark.range(100).withColumn("x", F.col("id") * 2))
    assert out.count() == 100
    assert out.agg(F.sum("x")).collect()[0][0] == 9900


def test_pin_with_dir_is_reliable_and_with_rank_survives(
        spark, _pin_env, tmp_path):
    ckpt = tmp_path / "ckpt"
    _pin_env.setCheckpointDir(str(ckpt))
    # the persist-around-checkpoint must not leave a stray cache behind
    # (localCheckpoints elsewhere legitimately stay persisted, so
    # measure the delta, not the absolute count)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = pin(spark.range(1000).withColumn("x", F.col("id") % 7))
    assert out.count() == 1000
    assert jsc.getPersistentRDDs().size() <= before, \
        "reliable pin leaked a persisted RDD"
    # the reliable path actually engaged: checkpoint part files landed
    # under the configured dir (localCheckpoint writes none)
    assert _ckpt_files(ckpt), "no reliable checkpoint files were written"

    # with_rank's determinism pin rides the same helper: ranks must be
    # a dense 1..N permutation consistent with the key order
    df = spark.createDataFrame(
        [("c%02d" % (i % 13), i // 13) for i in range(400)],
        "conv_id string, turn_idx int",
    )
    ranked = with_rank(df).collect()
    assert sorted(r.rank for r in ranked) == list(range(1, 401))
    by_rank = sorted(ranked, key=lambda r: r.rank)
    keys = [(r.conv_id, r.turn_idx) for r in by_rank]
    assert keys == sorted(keys)


def test_pin_mode_local_overrides_dir(spark, _pin_env, tmp_path):
    # the opt-out: an application that set a checkpoint dir for its own
    # purposes keeps sparkocr's internal barriers executor-local
    ckpt = tmp_path / "ckpt"
    _pin_env.setCheckpointDir(str(ckpt))
    spark.conf.set("spark.sparkocr.pin", "local")
    out = pin(spark.range(500).withColumn("x", F.col("id") % 3))
    assert out.count() == 500
    assert not _ckpt_files(ckpt), (
        "pin=local must not write to the checkpoint dir")


def test_pin_mode_reliable_requires_dir(spark, _pin_env, tmp_path):
    _pin_env.setCheckpointDir(None)
    spark.conf.set("spark.sparkocr.pin", "reliable")
    with pytest.raises(ValueError, match="requires a checkpoint dir"):
        pin(spark.range(10))
    # with a dir it engages
    ckpt = tmp_path / "ckpt"
    _pin_env.setCheckpointDir(str(ckpt))
    assert pin(spark.range(50)).count() == 50
    assert _ckpt_files(ckpt)


def test_pin_lazy_reliable_rejected(spark, _pin_env, tmp_path):
    # a lazy reliable checkpoint would let the first consumer and the
    # checkpoint files hold two different evaluations (SPARK-8582)
    _pin_env.setCheckpointDir(str(tmp_path / "ckpt"))
    with pytest.raises(ValueError, match="lazy reliable pin"):
        pin(spark.range(10), eager=False)
    # lazy LOCAL pins remain available
    _pin_env.setCheckpointDir(None)
    lazy = pin(spark.range(20).withColumn("x", F.lit(1)), eager=False)
    assert lazy.agg(F.sum("x")).collect()[0][0] == 20


def test_pin_preserves_caller_cache(spark, _pin_env, tmp_path):
    # a DataFrame the CALLER cached must stay cached after a reliable
    # pin — pin's persist/unpersist pair must not destroy the entry
    _pin_env.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.range(300).withColumn("x", F.col("id") % 11)
    df.cache()
    try:
        df.count()
        out = pin(df)
        assert out.count() == 300
        lvl = df.storageLevel
        assert lvl.useMemory or lvl.useDisk, (
            "pin unpersisted the caller's cache")
    finally:
        df.unpersist(True)


def test_pin_cache_optout(spark, _pin_env, tmp_path):
    # spark.sparkocr.pin.cache=false: compute-twice, no cache storage —
    # the escape hatch for subplans too large to persist
    ckpt = tmp_path / "ckpt"
    _pin_env.setCheckpointDir(str(ckpt))
    spark.conf.set("spark.sparkocr.pin.cache", "false")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = pin(spark.range(200).withColumn("x", F.col("id") % 5))
    assert out.count() == 200
    assert jsc.getPersistentRDDs().size() <= before
    assert _ckpt_files(ckpt)


def test_pin_mode_invalid_raises(spark, _pin_env):
    spark.conf.set("spark.sparkocr.pin", "ressilient")
    with pytest.raises(ValueError, match="spark.sparkocr.pin"):
        pin(spark.range(10))


def test_pin_warns_once_without_checkpoint_cleanup(
        spark, _pin_env, tmp_path, monkeypatch):
    # get_spark sets cleanCheckpoints=true, so simulate a foreign
    # session that left it off; the leak warning fires exactly once
    _pin_env.setCheckpointDir(str(tmp_path / "ckpt"))
    monkeypatch.setattr(barrier, "_cleanup_enabled", lambda sc: False)
    monkeypatch.setattr(barrier, "_warned_no_cleanup", False)
    with pytest.warns(UserWarning, match="cleanCheckpoints"):
        assert pin(spark.range(10)).count() == 10
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert pin(spark.range(10)).count() == 10
    again = [r for r in rec if "cleanCheckpoints" in str(r.message)]
    assert not again, "the leak warning must fire once per process"


def test_pin_session_default_has_cleanup_enabled(spark):
    # the engine's own sessions must never hit the leak path
    assert barrier._cleanup_enabled(spark.sparkContext)
