"""Sources: schemas, deterministic fixture generators, file I/O."""
