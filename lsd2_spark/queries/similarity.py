"""Similarity-search operators over the ``embeddings`` table.

Filled in alongside lsd2_spark.operators.similarity.
"""

from __future__ import annotations
