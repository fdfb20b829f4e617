"""Host-side utilities (weight conversion, logging, misc)."""
