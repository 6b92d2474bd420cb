"""Scalar/text functions: normalization, signatures, text analysis.

The per-row invariants of the engine live here (byte-identical HTML extraction and
the exact normalization pipeline, mirroring ``/root/reference/src/DataSetUtil.py``),
plus the vectorized signature kernels (MinHash/SimHash) that replace the reference's
BM25/Doc2Vec/neural scoring.
"""
