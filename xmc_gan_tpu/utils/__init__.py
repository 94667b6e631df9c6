"""Utilities: weight conversion, checkpointing, logging, misc tree helpers."""
