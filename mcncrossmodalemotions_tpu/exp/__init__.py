"""exp subpackage."""
