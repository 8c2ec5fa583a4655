"""Query plans: demo fixtures, KG pipeline, broadcast helpers."""
