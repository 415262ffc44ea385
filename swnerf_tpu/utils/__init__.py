"""Config system, metrics, logging, image utilities."""
