"""Query-plan registry + plan-inspection helpers."""
