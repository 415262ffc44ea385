"""Dataset loaders (host-side numpy) and synthetic test scenes."""
