"""zoo subpackage."""
