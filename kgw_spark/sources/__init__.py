"""Sources: synthetic corpus generator and raw-format readers."""
