"""Multi-chip scaling: device mesh + sharded train/eval steps."""
