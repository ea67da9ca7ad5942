"""Job plans: resumable, checkpointed extraction runs."""
