"""Nearest-neighbor graphs built from point clouds / features."""
