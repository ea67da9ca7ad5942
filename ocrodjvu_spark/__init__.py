"""ocrodjvu_spark: PySpark-native transcript text-extraction engine.

A from-scratch rebuild of ocrodjvu's extraction capabilities
(hOCR/djvused hidden-text parsing, zone segmentation, coordinate
transforms, word/char segmentation) as a Spark-first pipeline over
conversation-transcript tables, plus the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing). See README.md and COVERAGE.md.
"""

__version__ = '0.1.0'

from . import pipeline  # noqa: F401
from .session import get_spark  # noqa: F401
