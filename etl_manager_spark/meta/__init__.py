"""Metadata layer: agnostic type grammar, TableMeta/DatabaseMeta, JSON IO."""
