"""Handle-registry (C-ABI analog) lifecycle tests — the create / use /
destroy contract of capi.rs:73-126, mirroring the reference's own FFI
suite behaviors (test_ffi.py: create+destroy cycles, invalid-handle
status codes, multi-engine coexistence)."""

import pytest

from sparkocr import handles
from sparkocr.handles import RocrStatus


@pytest.fixture(autouse=True)
def _clean_registry():
    handles.cleanup()
    yield
    handles.cleanup()


def _docs(spark):
    return spark.createDataFrame(
        [("c1", 0, "user", "hello world this is plain prose line"),
         ("c1", 1, "assistant", "<b>tagged</b> reply with markup"),
         ("c2", 0, "user", "another conversation turn")],
        "conv_id string, turn_idx int, role string, text string",
    )


def test_create_returns_nonzero_distinct_handles(spark):
    h1 = handles.create_engine(spark)
    h2 = handles.create_engine(spark)
    assert h1 != 0 and h2 != 0 and h1 != h2
    assert handles.get_engine(h1) is not handles.get_engine(h2)


def test_destroy_semantics_match_capi(spark):
    # capi.rs:232-243 — destroying 0, a live handle, then the same
    # handle again: INVALID_PARAM / SUCCESS / INVALID_PARAM
    assert handles.destroy_engine(0) == RocrStatus.INVALID_PARAM
    h = handles.create_engine(spark)
    assert handles.destroy_engine(h) == RocrStatus.SUCCESS
    assert handles.destroy_engine(h) == RocrStatus.INVALID_PARAM
    assert handles.get_engine(h) is None


def test_recognize_on_dead_handle(spark):
    h = handles.create_engine(spark)
    handles.destroy_engine(h)
    st, df = handles.recognize_simple(h, _docs(spark))
    assert st == RocrStatus.NOT_INITIALIZED and df is None
    st, df = handles.recognize_detailed(0, _docs(spark))
    assert st == RocrStatus.INVALID_PARAM and df is None


def test_recognize_simple_equals_engine_extract(spark):
    from sparkocr.config import DEFAULT_CONFIG
    from sparkocr.engine import SparkOcrEngine

    h = handles.create_engine(spark)
    st, out = handles.recognize_simple(h, _docs(spark))
    assert st == RocrStatus.SUCCESS
    got = {(r["conv_id"], r["turn_idx"]): r["full_text"]
           for r in out.collect()}
    want = {
        (r["conv_id"], r["turn_idx"]): r["full_text"]
        for r in SparkOcrEngine(spark, DEFAULT_CONFIG)
        .extract(_docs(spark)).collect()
    }
    assert got == want


def test_recognize_detailed_carries_box_fields(spark):
    h = handles.create_engine_with_config(spark, rect_border_size=12,
                                          merge_boxes=True)
    st, out = handles.recognize_detailed(h, _docs(spark))
    assert st == RocrStatus.SUCCESS
    rows = out.collect()
    assert rows, "expected at least one detected block"
    # the RocrTextBox field set (capi.rs:28-35)
    for f in ("text", "confidence", "left", "top", "width", "height"):
        assert f in out.columns, f
    assert all(r["width"] > 0 and r["height"] > 0 for r in rows)


def test_bytes_vocabulary_restricts_decode(spark):
    # zero-size buffer → handle 0 (capi.rs:192-199)
    assert handles.create_engine_with_bytes(b"", spark=spark) == 0
    # a vocabulary without the letter 'z': out-of-vocab chars decode as
    # blanks (keys parity, rec.rs:55-59)
    keys = "\n".join(sorted(set("helo wrd plain prose line this"))).encode()
    h = handles.create_engine_with_bytes(keys, spark=spark)
    assert h != 0
    df = spark.createDataFrame([("c1", 0, "user", "hello zebra")],
                               "conv_id string, turn_idx int, role string, "
                               "text string")
    st, out = handles.recognize_simple(h, df)
    assert st == RocrStatus.SUCCESS
    txt = out.collect()[0]["full_text"]
    # out-of-vocab z/b decode as blanks; CTC dedupe collapses the
    # repeated l (rec.rs:359-383), so "hello zebra" → "helo era"
    assert txt == "helo era"


def test_cleanup_clears_registry(spark):
    hs = [handles.create_engine(spark) for _ in range(3)]
    handles.cleanup()
    assert all(handles.get_engine(h) is None for h in hs)
    # handles are never reused after cleanup (monotonic counter,
    # capi.rs:79-81)
    h_new = handles.create_engine(spark)
    assert h_new > max(hs)


def test_version_matches_package(spark):
    import sparkocr

    assert handles.version() == sparkocr.__version__
