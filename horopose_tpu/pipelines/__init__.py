"""Training / evaluation pipelines mirroring the reference CLI surface."""
