"""Operator library: reference-parity ingest + the full relational surface.

Submodules:
- ``ingest``     — the reference pipeline (parse/extract/validate/project/demux/sink)
- ``relational`` — joins, aggregations, windows, sorts, set ops (SURVEY.md §2.2)
- ``asof``       — point-in-time joins and rolling time-window features
- ``dedup``      — exact + MinHash/SimHash/n-gram near-duplicate detection
- ``text``       — text statistics, language-ID, quality scoring, fingerprints
- ``similarity`` — embedding similarity search (brute-force + LSH)
- ``multimodal`` — binary-column (image/audio) plumbing with stubbed codecs
"""
