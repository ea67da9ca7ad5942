"""Sources: table readers and the deterministic transcripts synthesizer."""
