"""Custom data sources (PySpark Python DataSource API)."""
