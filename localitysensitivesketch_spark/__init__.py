"""LocalitySensitiveSketch → PySpark-native near-duplicate detection engine."""

from .config import DEFAULT_CONFIG, SketchConfig

__all__ = ["SketchConfig", "DEFAULT_CONFIG"]
