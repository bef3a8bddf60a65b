"""Structured Streaming layer (SURVEY §2.C streaming row — green-field:
the reference has no streaming; Glue bookmarks are explicitly disabled,
reference ``etl.py:545``)."""
