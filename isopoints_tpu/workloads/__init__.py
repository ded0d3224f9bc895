"""End-to-end workloads (reference entry-point parity)."""
