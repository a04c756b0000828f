"""End-to-end pipelines: the canonical co-occurrence graphs the driver
verifies, and the flagship corpus pipeline."""
