"""Host-side dataset construction, QA, and analysis tools."""
