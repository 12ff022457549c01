"""Column-level helpers (pure pyspark.sql.functions compositions)."""
