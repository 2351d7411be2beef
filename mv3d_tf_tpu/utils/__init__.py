"""Utilities: timers, checkpointing, pretrained-weight import."""
