"""End-to-end Ray Data pipelines (lazy Dataset in, lazy Dataset out)."""
