"""Text-analysis and dedup operators over the ``documents`` table.

Filled in alongside lsd2_spark.operators.dedup / text_analysis.
"""

from __future__ import annotations
