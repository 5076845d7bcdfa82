"""nibbler-spark: a PySpark-native micro-batch processing + analytics engine.

Core semantics re-expressed from the reference library
``naughtygopher/nibbler`` (Go, /root/reference/nibbler.go) on Spark
Structured Streaming, plus a full relational / streaming / LLM-data-pipeline
operator surface designed for 100 TB scale (see SURVEY.md §2.3).
"""

from nibbler_spark.config import Config, Trigger
from nibbler_spark.errors import (
    NibblerError,
    NibblerStoppedError,
    NibblerValidationError,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "Trigger",
    "NibblerError",
    "NibblerStoppedError",
    "NibblerValidationError",
    "__version__",
]
