"""sparkocr — a PySpark-native two-stage (detect→recognize) main-content
extraction engine for multi-turn conversation transcripts.

Brand-new Spark-first design whose per-turn operator semantics mirror what
ramudaderuta/rust-paddle-ocr computes (see SURVEY.md): detection finds
content regions by text/link density on a character grid, recognition
decodes each region through a CTC-style threshold cascade. All per-turn
compute runs inside vectorized pandas/Arrow UDFs; everything relational
stays in Catalyst-optimized DataFrame ops.
"""

from .config import DEFAULT_CONFIG, FLAGSHIP_CONFIG, EngineConfig
from .detect import Box, TurnGrid, crop_box, find_text_boxes, merge_overlapping_boxes
from .pipeline import Block, TurnResult, extract_turn
from .recognize import (
    canonicalize,
    classify_block,
    predict_char_score,
    predict_str,
    predict_with_confidence,
)

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_CONFIG",
    "FLAGSHIP_CONFIG",
    "EngineConfig",
    "Box",
    "TurnGrid",
    "crop_box",
    "find_text_boxes",
    "merge_overlapping_boxes",
    "Block",
    "TurnResult",
    "extract_turn",
    "canonicalize",
    "classify_block",
    "predict_char_score",
    "predict_str",
    "predict_with_confidence",
    "__version__",
]
