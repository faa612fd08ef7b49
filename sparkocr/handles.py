"""Handle-registry surface: the C-ABI (`capi.rs`) re-expressed for Spark.

The reference exposes its engine to foreign callers through integer
handles backed by a locked global registry plus an atomic counter
(`capi.rs:73-126`): ``rocr_create_engine*`` insert a configured engine
and return a non-zero handle (0 = failure), verbs take the handle,
``rocr_destroy_engine`` removes one engine, ``rocr_cleanup`` drops them
all. This module mirrors that lifecycle 1:1 so a caller managing several
differently-configured extraction pipelines (different border sizes,
vocabularies, merge policies) gets the same create/use/destroy contract:

| reference (capi.rs)                 | here |
|-------------------------------------|------|
| ``rocr_create_engine``              | ``create_engine(spark, keys_path)`` |
| ``rocr_create_engine_with_config``  | ``create_engine_with_config(...)`` (capi.rs:130) |
| ``rocr_create_engine_with_bytes``   | ``create_engine_with_bytes(keys_data, ...)`` (capi.rs:181) |
| ``rocr_destroy_engine``             | ``destroy_engine(handle)`` (capi.rs:230) |
| ``rocr_recognize_detailed``         | ``recognize_detailed(handle, df)`` → boxes (capi.rs:250) |
| ``rocr_recognize_simple``           | ``recognize_simple(handle, df)`` → texts (capi.rs:402) |
| ``rocr_free_result`` / ``_simple``  | n/a — DataFrames/Arrow tables are GC-managed (capi.rs:526,557) |
| ``rocr_cleanup``                    | ``cleanup()`` (capi.rs:589) |
| ``rocr_version``                    | ``version()`` (capi.rs:598) |

Status codes are the reference's ``RocrStatus`` enum verbatim
(capi.rs:14-23), with the same edge semantics: handle 0 →
``INVALID_PARAM`` from EVERY verb (capi.rs:254-260 rejects it before
the registry lookup); an unknown non-zero handle → ``NOT_INITIALIZED``
from the recognize verbs (capi.rs:260-276) but ``INVALID_PARAM`` from
``destroy_engine`` (capi.rs:232-243); creation never raises — it
returns handle 0 exactly like the C entry points (capi.rs:117-125).

Shutdown parity (P8, engine.rs:470-473 + Drop at engine.rs:600-610):
destroying a handle severs the engine's registry reference; the
underlying SparkSession is deliberately NOT stopped (it is shared,
like the process the C library lives in) unless ``cleanup`` is asked
to with ``stop_session=True``.
"""

from __future__ import annotations

import threading
from enum import IntEnum

from pyspark.sql import DataFrame, SparkSession

from .config import DEFAULT_CONFIG, EngineConfig
from .engine import SparkOcrEngine, explode_blocks


class RocrStatus(IntEnum):
    """capi.rs:14-23, values identical."""

    SUCCESS = 0
    INIT_ERROR = 1
    FILE_NOT_FOUND = 2
    IMAGE_LOAD_ERROR = 3
    PROCESS_ERROR = 4
    MEMORY_ERROR = 5
    INVALID_PARAM = 6
    NOT_INITIALIZED = 7


# the locked registry + monotonically increasing handle counter
# (capi.rs:75-86: OnceCell<Mutex<HashMap>> + AtomicUsize starting at 1)
_LOCK = threading.Lock()
_ENGINES: dict[int, SparkOcrEngine] = {}
_NEXT_HANDLE = 1


def _insert(engine: SparkOcrEngine) -> int:
    global _NEXT_HANDLE
    with _LOCK:
        handle = _NEXT_HANDLE
        _NEXT_HANDLE += 1
        _ENGINES[handle] = engine
    return handle


def _build(spark: SparkSession | None, config: EngineConfig,
           keys_path: str | None, keys_data: bytes | None) -> int:
    """Shared constructor tail: resolve session, attach vocabulary,
    register. Failure → handle 0, never an exception (the C contract:
    every create_* error path returns 0, capi.rs:99-125)."""
    try:
        if spark is None:
            from .session import get_spark

            spark = get_spark()
        if keys_path is not None:
            from .keys import load_keys_file

            config = config.with_overrides(
                dictionary=load_keys_file(keys_path))
        elif keys_data is not None:
            from .keys import load_keys_bytes

            config = config.with_overrides(
                dictionary=load_keys_bytes(keys_data))
        return _insert(SparkOcrEngine(spark, config))
    except Exception:
        return 0


def create_engine(spark: SparkSession | None = None,
                  keys_path: str | None = None) -> int:
    """rocr_create_engine (capi.rs:89): default config. The reference's
    det/rec model paths are compiled-in rule tables here; the keys file
    is the one genuine file input and maps directly."""
    return _build(spark, DEFAULT_CONFIG, keys_path, None)


def create_engine_with_config(
    spark: SparkSession | None = None,
    keys_path: str | None = None,
    rect_border_size: int = 10,
    merge_boxes: bool = False,
    merge_threshold: int = 1,
) -> int:
    """rocr_create_engine_with_config (capi.rs:130): same three knobs,
    same defaults as ``OcrEngine::new_with_config`` (engine.rs:122-129;
    reference default merge_boxes=false is honored HERE, unlike the
    transcript-tuned engine default)."""
    cfg = EngineConfig(
        rect_border_size=rect_border_size,
        merge_boxes=merge_boxes,
        merge_threshold=merge_threshold,
    )
    return _build(spark, cfg, keys_path, None)


def create_engine_with_bytes(
    keys_data: bytes,
    spark: SparkSession | None = None,
    rect_border_size: int = 10,
    merge_boxes: bool = False,
    merge_threshold: int = 1,
) -> int:
    """rocr_create_engine_with_bytes (capi.rs:181): vocabulary from an
    in-memory buffer (the ``--py-files``-shipped asset path). Empty
    bytes → handle 0 (capi.rs:192-199 rejects zero-size buffers)."""
    if not keys_data:
        return 0
    cfg = EngineConfig(
        rect_border_size=rect_border_size,
        merge_boxes=merge_boxes,
        merge_threshold=merge_threshold,
    )
    return _build(spark, cfg, None, keys_data)


def get_engine(handle: int) -> SparkOcrEngine | None:
    """Registry lookup; None for 0/stale handles (no exception — status
    codes are the error channel on this surface)."""
    with _LOCK:
        return _ENGINES.get(handle)


def destroy_engine(handle: int) -> RocrStatus:
    """rocr_destroy_engine (capi.rs:230): SUCCESS iff the handle was
    live; 0 and unknown handles → INVALID_PARAM (capi.rs:232-243)."""
    if handle == 0:
        return RocrStatus.INVALID_PARAM
    with _LOCK:
        if _ENGINES.pop(handle, None) is None:
            return RocrStatus.INVALID_PARAM
    return RocrStatus.SUCCESS


def recognize_detailed(
    handle: int, df: DataFrame, text_col: str = "text",
) -> tuple[RocrStatus, DataFrame | None]:
    """rocr_recognize_detailed (capi.rs:250): full results with box
    geometry — one row per detected block carrying (text, confidence,
    left, top, width, height), the RocrTextBox fields (capi.rs:28-35).
    Plan-building errors surface as PROCESS_ERROR, matching the C
    wrapper's catch-all (capi.rs:56-66)."""
    if handle == 0:
        return RocrStatus.INVALID_PARAM, None
    eng = get_engine(handle)
    if eng is None:
        return RocrStatus.NOT_INITIALIZED, None
    try:
        return RocrStatus.SUCCESS, explode_blocks(
            eng.extract(df, text_col=text_col))
    except Exception:
        return RocrStatus.PROCESS_ERROR, None


def recognize_simple(
    handle: int, df: DataFrame, text_col: str = "text",
) -> tuple[RocrStatus, DataFrame | None]:
    """rocr_recognize_simple (capi.rs:402): texts only — per input row,
    the full extracted text (RocrSimpleResult's char** analog is the
    ``full_text`` column)."""
    if handle == 0:
        return RocrStatus.INVALID_PARAM, None
    eng = get_engine(handle)
    if eng is None:
        return RocrStatus.NOT_INITIALIZED, None
    try:
        keep = [c for c in ("conv_id", "turn_idx") if c in df.columns]
        return RocrStatus.SUCCESS, (
            eng.extract(df, text_col=text_col).select(*keep, "full_text"))
    except Exception:
        return RocrStatus.PROCESS_ERROR, None


def cleanup(stop_session: bool = False) -> None:
    """rocr_cleanup (capi.rs:589): drop every registered engine. With
    ``stop_session`` also stop the sessions the engines were bound to —
    the full P8 shutdown (engine.rs:470-473); off by default because a
    SparkSession, unlike a worker thread, is typically shared."""
    with _LOCK:
        engines = list(_ENGINES.values())
        _ENGINES.clear()
    if stop_session:
        for eng in engines:
            try:
                eng.spark.stop()
            except Exception:
                pass


def version() -> str:
    """rocr_version (capi.rs:598)."""
    from . import __version__

    return __version__
