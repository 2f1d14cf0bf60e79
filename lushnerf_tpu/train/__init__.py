"""Training: losses, staged schedule, optimizer, checkpointing, trainer."""
