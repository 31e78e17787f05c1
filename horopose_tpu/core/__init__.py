"""Training/eval engine: losses, jitted steps, metrics, checkpointing."""
